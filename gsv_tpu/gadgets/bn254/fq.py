"""Fq wire type and field-op bindings (reference: src/gadgets/bn254/fq.rs).

``FqWire`` wraps a 254-bit ``BigIntWires`` holding a base-field element in
Montgomery form (R = 2^254).  Host-side conversion helpers mirror
``fq.rs:130-169``.
"""

from __future__ import annotations

from gsv_tpu.bn254_host.field import Fq as HostFq
from gsv_tpu.circuit.wires import WireStruct
from gsv_tpu.gadgets import bigint
from gsv_tpu.gadgets.bigint import BigIntWires
from gsv_tpu.gadgets.bn254 import fp254
from gsv_tpu.gadgets.bn254.fp254 import FQ_PARAMS

N_BITS = 254


class FqWire(WireStruct):
    """A base-field element as 254 wires (LE bits of the Montgomery form)."""

    __slots__ = ("n",)

    def __init__(self, n: BigIntWires):
        assert len(n) == N_BITS
        self.n = n

    @classmethod
    def from_ctx(cls, ctx) -> "FqWire":
        return cls(BigIntWires.from_ctx(ctx, N_BITS))

    @classmethod
    def new_constant(cls, v: int) -> "FqWire":
        """v: standard-form host value; wires hold its Montgomery form."""
        return cls(BigIntWires.new_constant(N_BITS, FQ_PARAMS.to_mont(v % FQ_PARAMS.modulus)))

    def wires_flatten(self):
        return [self.n], None

    @classmethod
    def wires_unflatten(cls, aux, children):
        return cls(children[0])

    # -- host encode/decode -------------------------------------------

    @staticmethod
    def as_montgomery(v: int) -> int:
        return FQ_PARAMS.to_mont(v % FQ_PARAMS.modulus)

    @staticmethod
    def from_montgomery(m: int) -> HostFq:
        return HostFq(FQ_PARAMS.from_mont(m))

    @staticmethod
    def to_bits(v_mont: int) -> list[bool]:
        return [bool((v_mont >> i) & 1) for i in range(N_BITS)]

    @staticmethod
    def from_bits(bits: list[bool]) -> int:
        return bigint.int_from_bits(bits)


class _FqOps:
    """Bound field gadgets (Fq::{add,mul_montgomery,...}, fq.rs:195-297)."""

    PARAMS = FQ_PARAMS

    @staticmethod
    def _wrap(bn: BigIntWires) -> FqWire:
        return FqWire(bn)

    @classmethod
    def add(cls, ctx, a: FqWire, b: FqWire) -> FqWire:
        return cls._wrap(fp254.add(ctx, a.n, b.n, fp=cls.PARAMS))

    @classmethod
    def add_constant(cls, ctx, a: FqWire, b: int) -> FqWire:
        return cls._wrap(fp254.add_constant(ctx, a.n, b=b % cls.PARAMS.modulus, fp=cls.PARAMS))

    @classmethod
    def sub(cls, ctx, a: FqWire, b: FqWire) -> FqWire:
        return cls._wrap(fp254.sub(ctx, a.n, b.n, fp=cls.PARAMS))

    @classmethod
    def neg(cls, ctx, a: FqWire) -> FqWire:
        return cls._wrap(fp254.neg(ctx, a.n, fp=cls.PARAMS))

    @classmethod
    def double(cls, ctx, a: FqWire) -> FqWire:
        return cls._wrap(fp254.double(ctx, a.n, fp=cls.PARAMS))

    @classmethod
    def half(cls, ctx, a: FqWire) -> FqWire:
        return cls._wrap(fp254.half(ctx, a.n, fp=cls.PARAMS))

    @classmethod
    def triple(cls, ctx, a: FqWire) -> FqWire:
        return cls._wrap(fp254.triple(ctx, a.n, fp=cls.PARAMS))

    @classmethod
    def div6(cls, ctx, a: FqWire) -> FqWire:
        return cls._wrap(fp254.div6(ctx, a.n, fp=cls.PARAMS))

    @classmethod
    def mul_montgomery(cls, ctx, a: FqWire, b: FqWire) -> FqWire:
        return cls._wrap(fp254.mul_montgomery(ctx, a.n, b.n, fp=cls.PARAMS))

    @classmethod
    def mul_by_constant_montgomery(cls, ctx, a: FqWire, b: int) -> FqWire:
        return cls._wrap(
            fp254.mul_by_constant_montgomery(ctx, a.n, b=b % cls.PARAMS.modulus, fp=cls.PARAMS)
        )

    @classmethod
    def square_montgomery(cls, ctx, a: FqWire) -> FqWire:
        return cls._wrap(fp254.square_montgomery(ctx, a.n, fp=cls.PARAMS))

    @classmethod
    def inverse_montgomery(cls, ctx, a: FqWire) -> FqWire:
        return cls._wrap(fp254.inverse_montgomery(ctx, a.n, fp=cls.PARAMS))

    @classmethod
    def exp_by_constant_montgomery(cls, ctx, a: FqWire, exp: int) -> FqWire:
        return cls._wrap(
            fp254.exp_by_constant_montgomery(ctx, a.n, exp=exp, fp=cls.PARAMS)
        )

    @classmethod
    def sqrt_montgomery(cls, ctx, a: FqWire) -> FqWire:
        return cls._wrap(fp254.sqrt_montgomery(ctx, a.n, fp=cls.PARAMS))

    @classmethod
    def is_qnr_montgomery(cls, ctx, a: FqWire) -> int:
        return fp254.is_qnr_montgomery(ctx, a.n, fp=cls.PARAMS)

    @classmethod
    def equal_constant(cls, ctx, a: FqWire, b: int) -> int:
        return fp254.equal_constant(ctx, a.n, b, fp=cls.PARAMS)

    @classmethod
    def equal(cls, ctx, a: FqWire, b: FqWire) -> int:
        return bigint.equal(ctx, a.n, b.n)

    @classmethod
    def select(cls, ctx, a: FqWire, b: FqWire, s: int) -> FqWire:
        return cls._wrap(bigint.select(ctx, a.n, b.n, s))

    @classmethod
    def multiplexer(cls, ctx, a: list[FqWire], s: list[int], w: int) -> FqWire:
        return cls._wrap(bigint.multiplexer(ctx, [x.n for x in a], s, w=w))


Fq = _FqOps
