"""Fr (scalar field) wire type and field-op bindings.

Reference parity: ``src/gadgets/bn254/fr.rs`` — the same ``Fp254Impl``
gadget core instantiated with the scalar-field modulus.  The Groth16
verifier itself never does in-circuit Fr arithmetic (scalars enter as raw
bits feeding MSM window selectors, see g1.py ``FrScalarWire``); these ops
exist for capability parity.
"""

from __future__ import annotations

from gsv_tpu.bn254_host.field import Fr as HostFr
from gsv_tpu.circuit.wires import WireStruct
from gsv_tpu.gadgets import bigint
from gsv_tpu.gadgets.bigint import BigIntWires
from gsv_tpu.gadgets.bn254 import fp254
from gsv_tpu.gadgets.bn254.fp254 import FR_PARAMS

N_BITS = 254


class FrWire(WireStruct):
    __slots__ = ("n",)

    def __init__(self, n: BigIntWires):
        assert len(n) == N_BITS
        self.n = n

    @classmethod
    def from_ctx(cls, ctx) -> "FrWire":
        return cls(BigIntWires.from_ctx(ctx, N_BITS))

    def wires_flatten(self):
        return [self.n], None

    @classmethod
    def wires_unflatten(cls, aux, children):
        return cls(children[0])

    @staticmethod
    def as_montgomery(v: int) -> int:
        return FR_PARAMS.to_mont(v % FR_PARAMS.modulus)

    @staticmethod
    def from_montgomery(m: int) -> HostFr:
        return HostFr(FR_PARAMS.from_mont(m))


class Fr:
    PARAMS = FR_PARAMS

    @classmethod
    def add(cls, ctx, a: FrWire, b: FrWire) -> FrWire:
        return FrWire(fp254.add(ctx, a.n, b.n, fp=cls.PARAMS))

    @classmethod
    def sub(cls, ctx, a: FrWire, b: FrWire) -> FrWire:
        return FrWire(fp254.sub(ctx, a.n, b.n, fp=cls.PARAMS))

    @classmethod
    def neg(cls, ctx, a: FrWire) -> FrWire:
        return FrWire(fp254.neg(ctx, a.n, fp=cls.PARAMS))

    @classmethod
    def double(cls, ctx, a: FrWire) -> FrWire:
        return FrWire(fp254.double(ctx, a.n, fp=cls.PARAMS))

    @classmethod
    def half(cls, ctx, a: FrWire) -> FrWire:
        return FrWire(fp254.half(ctx, a.n, fp=cls.PARAMS))

    @classmethod
    def triple(cls, ctx, a: FrWire) -> FrWire:
        return FrWire(fp254.triple(ctx, a.n, fp=cls.PARAMS))

    @classmethod
    def mul_montgomery(cls, ctx, a: FrWire, b: FrWire) -> FrWire:
        return FrWire(fp254.mul_montgomery(ctx, a.n, b.n, fp=cls.PARAMS))

    @classmethod
    def mul_by_constant_montgomery(cls, ctx, a: FrWire, b: int) -> FrWire:
        return FrWire(
            fp254.mul_by_constant_montgomery(ctx, a.n, b=b % cls.PARAMS.modulus, fp=cls.PARAMS)
        )

    @classmethod
    def square_montgomery(cls, ctx, a: FrWire) -> FrWire:
        return FrWire(fp254.square_montgomery(ctx, a.n, fp=cls.PARAMS))

    @classmethod
    def inverse_montgomery(cls, ctx, a: FrWire) -> FrWire:
        return FrWire(fp254.inverse_montgomery(ctx, a.n, fp=cls.PARAMS))

    @classmethod
    def exp_by_constant_montgomery(cls, ctx, a: FrWire, exp: int) -> FrWire:
        return FrWire(fp254.exp_by_constant_montgomery(ctx, a.n, exp=exp, fp=cls.PARAMS))

    @classmethod
    def equal(cls, ctx, a: FrWire, b: FrWire) -> int:
        return bigint.equal(ctx, a.n, b.n)

    @classmethod
    def equal_constant(cls, ctx, a: FrWire, b: int) -> int:
        return fp254.equal_constant(ctx, a.n, b, fp=cls.PARAMS)
