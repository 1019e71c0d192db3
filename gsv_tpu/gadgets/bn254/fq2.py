"""Fq2 (quadratic extension) circuit gadgets.

Reference parity: ``src/gadgets/bn254/fq2.rs`` — Karatsuba-style multiply,
nonresidue (9+u) via triple chains, inverse via the norm, frobenius as a
constant multiply, and the two square-root gadgets used by G2 decompression.
"""

from __future__ import annotations

from gsv_tpu.bn254_host.field import Fq2 as HostFq2, Fq as HostFq, P
from gsv_tpu.circuit.wires import WireStruct
from gsv_tpu.circuit.builder import component
from gsv_tpu.gadgets import bigint
from gsv_tpu.gadgets.bigint import BigIntWires
from gsv_tpu.gadgets.bn254.fq import Fq, FqWire, N_BITS

# Frobenius coefficients for Fq2 c1: (u^p)/u = -1 (fq2.rs:374-385)
FROBENIUS_COEFF_FP2_C1 = [HostFq(1), HostFq(-1)]


class Fq2Wire(WireStruct):
    __slots__ = ("c0", "c1")

    def __init__(self, c0: FqWire, c1: FqWire):
        self.c0 = c0
        self.c1 = c1

    @classmethod
    def from_ctx(cls, ctx) -> "Fq2Wire":
        return cls(FqWire.from_ctx(ctx), FqWire.from_ctx(ctx))

    @classmethod
    def new_constant(cls, v: HostFq2) -> "Fq2Wire":
        return cls(FqWire.new_constant(int(v.c0)), FqWire.new_constant(int(v.c1)))

    def wires_flatten(self):
        return [self.c0, self.c1], None

    @classmethod
    def wires_unflatten(cls, aux, children):
        return cls(children[0], children[1])

    @staticmethod
    def as_montgomery(v: HostFq2) -> tuple[int, int]:
        return (FqWire.as_montgomery(int(v.c0)), FqWire.as_montgomery(int(v.c1)))

    @staticmethod
    def from_montgomery(m: tuple[int, int]) -> HostFq2:
        return HostFq2(FqWire.from_montgomery(m[0]), FqWire.from_montgomery(m[1]))


class Fq2Ops:
    @staticmethod
    def equal_constant(ctx, a: Fq2Wire, b: HostFq2) -> int:
        u = Fq.equal_constant(ctx, a.c0, FqWire.as_montgomery(int(b.c0)))
        v = Fq.equal_constant(ctx, a.c1, FqWire.as_montgomery(int(b.c1)))
        return ctx.and_(u, v)

    @staticmethod
    def add(ctx, a: Fq2Wire, b: Fq2Wire) -> Fq2Wire:
        return Fq2Wire(Fq.add(ctx, a.c0, b.c0), Fq.add(ctx, a.c1, b.c1))

    @staticmethod
    def add_constant(ctx, a: Fq2Wire, b: HostFq2) -> Fq2Wire:
        return Fq2Wire(
            Fq.add_constant(ctx, a.c0, int(b.c0)), Fq.add_constant(ctx, a.c1, int(b.c1))
        )

    @staticmethod
    def neg(ctx, a: Fq2Wire) -> Fq2Wire:
        return Fq2Wire(Fq.neg(ctx, a.c0), Fq.neg(ctx, a.c1))

    @staticmethod
    def sub(ctx, a: Fq2Wire, b: Fq2Wire) -> Fq2Wire:
        return Fq2Wire(Fq.sub(ctx, a.c0, b.c0), Fq.sub(ctx, a.c1, b.c1))

    @staticmethod
    def double(ctx, a: Fq2Wire) -> Fq2Wire:
        return Fq2Wire(Fq.double(ctx, a.c0), Fq.double(ctx, a.c1))

    @staticmethod
    def half(ctx, a: Fq2Wire) -> Fq2Wire:
        return Fq2Wire(Fq.half(ctx, a.c0), Fq.half(ctx, a.c1))

    @staticmethod
    def triple(ctx, a: Fq2Wire) -> Fq2Wire:
        a2 = Fq2Ops.double(ctx, a)
        return Fq2Ops.add(ctx, a, a2)

    @staticmethod
    def mul_montgomery(ctx, a: Fq2Wire, b: Fq2Wire) -> Fq2Wire:
        """Karatsuba: 3 Fq muls (fq2.rs:230-255)."""
        a_sum = Fq.add(ctx, a.c0, a.c1)
        b_sum = Fq.add(ctx, b.c0, b.c1)
        a0_b0 = Fq.mul_montgomery(ctx, a.c0, b.c0)
        a1_b1 = Fq.mul_montgomery(ctx, a.c1, b.c1)
        sum_prod = Fq.mul_montgomery(ctx, a_sum, b_sum)
        c0 = Fq.sub(ctx, a0_b0, a1_b1)
        sum_ab = Fq.add(ctx, a0_b0, a1_b1)
        c1 = Fq.sub(ctx, sum_prod, sum_ab)
        return Fq2Wire(c0, c1)

    @staticmethod
    def mul_by_constant_montgomery(ctx, a: Fq2Wire, b: HostFq2) -> Fq2Wire:
        if b == HostFq2.one():
            return Fq2Wire(a.c0, a.c1)
        a_sum = Fq.add(ctx, a.c0, a.c1)
        a0_b0 = Fq.mul_by_constant_montgomery(ctx, a.c0, int(b.c0))
        a1_b1 = Fq.mul_by_constant_montgomery(ctx, a.c1, int(b.c1))
        sum_mul_sum = Fq.mul_by_constant_montgomery(ctx, a_sum, int(b.c0 + b.c1))
        c0 = Fq.sub(ctx, a0_b0, a1_b1)
        ab_sum = Fq.add(ctx, a0_b0, a1_b1)
        c1 = Fq.sub(ctx, sum_mul_sum, ab_sum)
        return Fq2Wire(c0, c1)

    @staticmethod
    def mul_by_fq_montgomery(ctx, a: Fq2Wire, b: FqWire) -> Fq2Wire:
        return Fq2Wire(
            Fq.mul_montgomery(ctx, a.c0, b), Fq.mul_montgomery(ctx, a.c1, b)
        )

    @staticmethod
    def mul_by_constant_fq_montgomery(ctx, a: Fq2Wire, b: int) -> Fq2Wire:
        return Fq2Wire(
            Fq.mul_by_constant_montgomery(ctx, a.c0, b),
            Fq.mul_by_constant_montgomery(ctx, a.c1, b),
        )

    @staticmethod
    def mul_constant_by_fq_montgomery(ctx, a: HostFq2, b: FqWire) -> Fq2Wire:
        return _mul_constant_by_fq_montgomery(ctx, b, a_const=(int(a.c0), int(a.c1)))

    @staticmethod
    def mul_by_nonresidue(ctx, a: Fq2Wire) -> Fq2Wire:
        """(a0 + a1 u)(9 + u) via two triple-chains (fq2.rs:324-339)."""
        a0_3 = Fq.triple(ctx, a.c0)
        a0_9 = Fq.triple(ctx, a0_3)
        a1_3 = Fq.triple(ctx, a.c1)
        a1_9 = Fq.triple(ctx, a1_3)
        c0 = Fq.sub(ctx, a0_9, a.c1)
        c1 = Fq.add(ctx, a1_9, a.c0)
        return Fq2Wire(c0, c1)

    @staticmethod
    def square_montgomery(ctx, a: Fq2Wire) -> Fq2Wire:
        a0_plus_a1 = Fq.add(ctx, a.c0, a.c1)
        a0_minus_a1 = Fq.sub(ctx, a.c0, a.c1)
        a0_a1 = Fq.mul_montgomery(ctx, a.c0, a.c1)
        c0 = Fq.mul_montgomery(ctx, a0_plus_a1, a0_minus_a1)
        c1 = Fq.double(ctx, a0_a1)
        return Fq2Wire(c0, c1)

    @staticmethod
    def inverse_montgomery(ctx, a: Fq2Wire) -> Fq2Wire:
        return _inverse_montgomery(ctx, a)

    @staticmethod
    def frobenius_montgomery(ctx, a: Fq2Wire, i: int) -> Fq2Wire:
        coef = FROBENIUS_COEFF_FP2_C1[i % 2]
        c1 = Fq.mul_by_constant_montgomery(ctx, a.c1, FqWire.as_montgomery(int(coef)))
        return Fq2Wire(a.c0, c1)

    @staticmethod
    def conjugate(ctx, a: Fq2Wire) -> Fq2Wire:
        return Fq2Wire(a.c0, Fq.neg(ctx, a.c1))

    @staticmethod
    def div6(ctx, a: Fq2Wire) -> Fq2Wire:
        return Fq2Wire(Fq.div6(ctx, a.c0), Fq.div6(ctx, a.c1))

    @staticmethod
    def norm_montgomery(ctx, c0: FqWire, c1: FqWire) -> FqWire:
        c0_sq = Fq.square_montgomery(ctx, c0)
        c1_sq = Fq.square_montgomery(ctx, c1)
        return Fq.add(ctx, c0_sq, c1_sq)

    @staticmethod
    def sqrt_c1_zero_montgomery(ctx, a: Fq2Wire, is_qr: int) -> Fq2Wire:
        """sqrt when c1 == 0 (fq2.rs:407-423)."""
        c0_sqrt = Fq.sqrt_montgomery(ctx, a.c0)
        c0_neg = Fq.neg(ctx, a.c0)
        c1_sqrt = Fq.sqrt_montgomery(ctx, c0_neg)
        zero = BigIntWires.new_constant(N_BITS, 0)
        c0_final = bigint.select(ctx, c0_sqrt.n, zero, is_qr)
        c1_final = bigint.select(ctx, zero, c1_sqrt.n, is_qr)
        return Fq2Wire(FqWire(c0_final), FqWire(c1_final))

    @staticmethod
    def sqrt_general_montgomery(ctx, a: Fq2Wire) -> Fq2Wire:
        return _sqrt_general_montgomery(ctx, a)

    @staticmethod
    def select(ctx, a: Fq2Wire, b: Fq2Wire, s: int) -> Fq2Wire:
        return Fq2Wire(Fq.select(ctx, a.c0, b.c0, s), Fq.select(ctx, a.c1, b.c1, s))

    @staticmethod
    def multiplexer(ctx, a: list[Fq2Wire], s: list[int], w: int) -> Fq2Wire:
        return Fq2Wire(
            Fq.multiplexer(ctx, [x.c0 for x in a], s, w),
            Fq.multiplexer(ctx, [x.c1 for x in a], s, w),
        )


@component(offcircuit=("a_const",), name="fq2.mul_constant_by_fq")
def _mul_constant_by_fq_montgomery(ctx, b: FqWire, *, a_const: tuple) -> Fq2Wire:
    """Constant Fq2 times variable Fq (fq2.rs:308-322)."""
    a0_m = FqWire.as_montgomery(a_const[0])
    a1_m = FqWire.as_montgomery(a_const[1])
    c0 = Fq.mul_by_constant_montgomery(ctx, b, a0_m)
    c1 = Fq.mul_by_constant_montgomery(ctx, b, a1_m)
    return Fq2Wire(c0, c1)


@component(name="fq2.inverse_montgomery")
def _inverse_montgomery(ctx, a: Fq2Wire) -> Fq2Wire:
    """(a0 - a1 u)/(a0^2 + a1^2) (fq2.rs:356-372)."""
    a0_sq = Fq.square_montgomery(ctx, a.c0)
    a1_sq = Fq.square_montgomery(ctx, a.c1)
    norm = Fq.add(ctx, a0_sq, a1_sq)
    inv_norm = Fq.inverse_montgomery(ctx, norm)
    c0 = Fq.mul_montgomery(ctx, a.c0, inv_norm)
    neg_a1 = Fq.neg(ctx, a.c1)
    c1 = Fq.mul_montgomery(ctx, neg_a1, inv_norm)
    return Fq2Wire(c0, c1)


@component(name="fq2.sqrt_general_montgomery")
def _sqrt_general_montgomery(ctx, a: Fq2Wire) -> Fq2Wire:
    """Complex-method sqrt (eprint 2012/685 alg 8; fq2.rs:425-447)."""
    alpha = Fq2Ops.norm_montgomery(ctx, a.c0, a.c1)
    alpha_sqrt = Fq.sqrt_montgomery(ctx, alpha)
    delta_plus = Fq.add(ctx, alpha_sqrt, a.c0)
    delta = Fq.half(ctx, delta_plus)
    is_qnr = Fq.is_qnr_montgomery(ctx, delta)
    delta_alt = Fq.sub(ctx, delta, alpha_sqrt)
    delta_final = FqWire(bigint.select(ctx, delta_alt.n, delta.n, is_qnr))
    c0_final = Fq.sqrt_montgomery(ctx, delta_final)
    c0_inv = Fq.inverse_montgomery(ctx, c0_final)
    c1_half = Fq.half(ctx, a.c1)
    c1_final = Fq.mul_montgomery(ctx, c0_inv, c1_half)
    return Fq2Wire(c0_final, c1_final)


Fq2 = Fq2Ops
