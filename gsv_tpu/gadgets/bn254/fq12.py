"""Fq12 (tower top) circuit gadgets.

Reference parity: ``src/gadgets/bn254/fq12.rs`` — Karatsuba multiply, sparse
Miller-loop multiplies (``mul_by_034``, ``mul_by_034_constant4``),
Granger-Scott cyclotomic squaring, norm-based inverse, frobenius, conjugate.
"""

from __future__ import annotations

from gsv_tpu.bn254_host.field import (
    FROB_FQ12_C1,
    Fq2 as HostFq2,
    Fq12 as HostFq12,
)
from gsv_tpu.circuit.wires import WireStruct
from gsv_tpu.circuit.builder import component
from gsv_tpu.gadgets.bn254.fq2 import Fq2, Fq2Wire
from gsv_tpu.gadgets.bn254.fq6 import Fq6, Fq6Wire, _as_mont_fq2


class Fq12Wire(WireStruct):
    __slots__ = ("c0", "c1")

    def __init__(self, c0: Fq6Wire, c1: Fq6Wire):
        self.c0 = c0
        self.c1 = c1

    @classmethod
    def from_ctx(cls, ctx) -> "Fq12Wire":
        return cls(Fq6Wire.from_ctx(ctx), Fq6Wire.from_ctx(ctx))

    @classmethod
    def new_constant(cls, v: HostFq12) -> "Fq12Wire":
        return cls(Fq6Wire.new_constant(v.c0), Fq6Wire.new_constant(v.c1))

    def wires_flatten(self):
        return [self.c0, self.c1], None

    @classmethod
    def wires_unflatten(cls, aux, children):
        return cls(*children)


class Fq12Ops:
    @staticmethod
    def equal_constant(ctx, a: Fq12Wire, b: HostFq12) -> int:
        u = Fq6.equal_constant(ctx, a.c0, b.c0)
        v = Fq6.equal_constant(ctx, a.c1, b.c1)
        return ctx.and_(u, v)

    @staticmethod
    def add(ctx, a, b):
        return Fq12Wire(Fq6.add(ctx, a.c0, b.c0), Fq6.add(ctx, a.c1, b.c1))

    @staticmethod
    def neg(ctx, a):
        return Fq12Wire(Fq6.neg(ctx, a.c0), Fq6.neg(ctx, a.c1))

    @staticmethod
    def sub(ctx, a, b):
        return Fq12Wire(Fq6.sub(ctx, a.c0, b.c0), Fq6.sub(ctx, a.c1, b.c1))

    @staticmethod
    def double(ctx, a):
        return Fq12Wire(Fq6.double(ctx, a.c0), Fq6.double(ctx, a.c1))

    @staticmethod
    def mul_montgomery(ctx, a: Fq12Wire, b: Fq12Wire) -> Fq12Wire:
        return _mul_montgomery(ctx, a, b)

    @staticmethod
    def mul_by_constant_montgomery(ctx, a: Fq12Wire, b: HostFq12) -> Fq12Wire:
        """Karatsuba with constant operand (fq12.rs:223-249)."""
        a_sum = Fq6.add(ctx, a.c0, a.c1)
        a0_b0 = Fq6.mul_by_constant_montgomery(ctx, a.c0, b.c0)
        a1_b1 = Fq6.mul_by_constant_montgomery(ctx, a.c1, b.c1)
        sum_ab = Fq6.add(ctx, a0_b0, a1_b1)
        sum_prod = Fq6.mul_by_constant_montgomery(ctx, a_sum, b.c0 + b.c1)
        a1_b1_nonres = Fq6.mul_by_nonresidue(ctx, a1_b1)
        c0 = Fq6.add(ctx, a0_b0, a1_b1_nonres)
        c1 = Fq6.sub(ctx, sum_prod, sum_ab)
        return Fq12Wire(c0, c1)

    @staticmethod
    def mul_by_34_montgomery(ctx, a: Fq12Wire, c3: Fq2Wire, c4: Fq2Wire) -> Fq12Wire:
        """Sparse (1 + c3 w + c4 v w) multiply (fq12.rs:250-266)."""
        w1 = Fq6.mul_by_01_montgomery(ctx, a.c1, c3, c4)
        w2 = Fq6.mul_by_nonresidue(ctx, w1)
        new_c0 = Fq6.add(ctx, w2, a.c0)
        w3 = Fq6.add(ctx, a.c0, a.c1)
        one_mont = _as_mont_fq2(HostFq2.one())
        w4 = Fq2.add_constant(ctx, c3, one_mont)
        w5 = Fq6.mul_by_01_montgomery(ctx, w3, w4, c4)
        w6 = Fq6.add(ctx, w1, a.c0)
        new_c1 = Fq6.sub(ctx, w5, w6)
        return Fq12Wire(new_c0, new_c1)

    @staticmethod
    def mul_by_034_montgomery(ctx, a, c0, c3, c4):
        return _mul_by_034_montgomery(ctx, a, c0, c3, c4)

    @staticmethod
    def mul_by_034_constant4_montgomery(ctx, a, c0, c3, c4: HostFq2):
        return _mul_by_034_constant4_montgomery(ctx, a, c0, c3, c4_const=(int(c4.c0), int(c4.c1)))

    @staticmethod
    def square_montgomery(ctx, a):
        return _square_montgomery(ctx, a)

    @staticmethod
    def cyclotomic_square_montgomery(ctx, a: Fq12Wire) -> Fq12Wire:
        """Granger-Scott squaring in the cyclotomic subgroup (fq12.rs:326-392)."""
        c0, c1, c2 = a.c0.c0, a.c0.c1, a.c0.c2
        c3, c4, c5 = a.c1.c0, a.c1.c1, a.c1.c2

        def gs_pair(x, y, swap_beta_on_x: bool):
            # returns (t_even, t_odd) for the pair
            xy = Fq2.mul_montgomery(ctx, x, y)
            x_plus_y = Fq2.add(ctx, x, y)
            if swap_beta_on_x:
                y_beta = Fq2.mul_by_nonresidue(ctx, x)
                x_plus_y_beta = Fq2.add(ctx, y, y_beta)
            else:
                y_beta = Fq2.mul_by_nonresidue(ctx, y)
                x_plus_y_beta = Fq2.add(ctx, x, y_beta)
            xy_beta = Fq2.mul_by_nonresidue(ctx, xy)
            w1 = Fq2.mul_montgomery(ctx, x_plus_y, x_plus_y_beta)
            w2 = Fq2.add(ctx, xy, xy_beta)
            t_even = Fq2.sub(ctx, w1, w2)
            t_odd = Fq2.double(ctx, xy)
            return t_even, t_odd

        t0, t1 = gs_pair(c0, c4, False)
        t2, t3 = gs_pair(c2, c3, True)
        t4, t5 = gs_pair(c1, c5, False)

        def comb_sub(t, c):
            w1 = Fq2.sub(ctx, t, c)
            w2 = Fq2.double(ctx, w1)
            return Fq2.add(ctx, w2, t)

        def comb_add(t, c):
            w1 = Fq2.add(ctx, t, c)
            w2 = Fq2.double(ctx, w1)
            return Fq2.add(ctx, w2, t)

        z0 = comb_sub(t0, c0)
        z4 = comb_sub(t2, c1)
        z3 = comb_sub(t4, c2)
        t5_beta = Fq2.mul_by_nonresidue(ctx, t5)
        z2 = comb_add(t5_beta, c3)
        z1 = comb_add(t1, c4)
        z5 = comb_add(t3, c5)
        return Fq12Wire(Fq6Wire(z0, z4, z3), Fq6Wire(z2, z1, z5))

    @staticmethod
    def inverse_montgomery(ctx, a):
        return _inverse_montgomery(ctx, a)

    @staticmethod
    def frobenius_montgomery(ctx, a: Fq12Wire, i: int) -> Fq12Wire:
        f0 = Fq6.frobenius_montgomery(ctx, a.c0, i)
        f1 = Fq6.frobenius_montgomery(ctx, a.c1, i)
        coef = _as_mont_fq2(FROB_FQ12_C1[i % 12])
        x = Fq6.mul_by_constant_fq2_montgomery(ctx, f1, coef)
        return Fq12Wire(f0, x)

    @staticmethod
    def conjugate(ctx, a: Fq12Wire) -> Fq12Wire:
        return Fq12Wire(a.c0, Fq6.neg(ctx, a.c1))


@component(name="fq12.mul_montgomery")
def _mul_montgomery(ctx, a: Fq12Wire, b: Fq12Wire) -> Fq12Wire:
    """Karatsuba over Fq6 (fq12.rs:198-221)."""
    a_sum = Fq6.add(ctx, a.c0, a.c1)
    b_sum = Fq6.add(ctx, b.c0, b.c1)
    a0_b0 = Fq6.mul_montgomery(ctx, a.c0, b.c0)
    a1_b1 = Fq6.mul_montgomery(ctx, a.c1, b.c1)
    sum_ab = Fq6.add(ctx, a0_b0, a1_b1)
    sum_prod = Fq6.mul_montgomery(ctx, a_sum, b_sum)
    a1_b1_nonres = Fq6.mul_by_nonresidue(ctx, a1_b1)
    c0 = Fq6.add(ctx, a0_b0, a1_b1_nonres)
    c1 = Fq6.sub(ctx, sum_prod, sum_ab)
    return Fq12Wire(c0, c1)


@component(name="fq12.mul_by_034")
def _mul_by_034_montgomery(
    ctx, a: Fq12Wire, c0: Fq2Wire, c3: Fq2Wire, c4: Fq2Wire
) -> Fq12Wire:
    """Sparse (c0 + c3 w + c4 v w) multiply (fq12.rs:267-286)."""
    w1 = Fq6.mul_by_01_montgomery(ctx, a.c1, c3, c4)
    w2 = Fq6.mul_by_nonresidue(ctx, w1)
    w3 = Fq6.mul_by_fq2_montgomery(ctx, a.c0, c0)
    new_c0 = Fq6.add(ctx, w2, w3)
    w4 = Fq6.add(ctx, a.c0, a.c1)
    w5 = Fq2.add(ctx, c3, c0)
    w6 = Fq6.mul_by_01_montgomery(ctx, w4, w5, c4)
    w7 = Fq6.add(ctx, w1, w3)
    new_c1 = Fq6.sub(ctx, w6, w7)
    return Fq12Wire(new_c0, new_c1)


@component(offcircuit=("c4_const",), name="fq12.mul_by_034_constant4")
def _mul_by_034_constant4_montgomery(
    ctx, a: Fq12Wire, c0: Fq2Wire, c3: Fq2Wire, *, c4_const: tuple
) -> Fq12Wire:
    """Sparse multiply with constant c4 (fq12.rs:287-310)."""
    from gsv_tpu.bn254_host.field import Fq as HostFq

    c4 = HostFq2(HostFq(c4_const[0]), HostFq(c4_const[1]))
    w1 = Fq6.mul_by_01_constant1_montgomery(ctx, a.c1, c3, c4)
    w2 = Fq6.mul_by_nonresidue(ctx, w1)
    w3 = Fq6.mul_by_fq2_montgomery(ctx, a.c0, c0)
    new_c0 = Fq6.add(ctx, w2, w3)
    w4 = Fq6.add(ctx, a.c0, a.c1)
    w5 = Fq2.add(ctx, c3, c0)
    w6 = Fq6.mul_by_01_constant1_montgomery(ctx, w4, w5, c4)
    w7 = Fq6.add(ctx, w1, w3)
    new_c1 = Fq6.sub(ctx, w6, w7)
    return Fq12Wire(new_c0, new_c1)


@component(name="fq12.square_montgomery")
def _square_montgomery(ctx, a: Fq12Wire) -> Fq12Wire:
    """(fq12.rs:311-325)."""
    w1 = Fq6.add(ctx, a.c0, a.c1)
    w2 = Fq6.mul_by_nonresidue(ctx, a.c1)
    w3 = Fq6.add(ctx, a.c0, w2)
    w4 = Fq6.mul_montgomery(ctx, a.c0, a.c1)
    w5 = Fq6.mul_montgomery(ctx, w1, w3)
    w6 = Fq6.mul_by_nonresidue(ctx, w4)
    w7 = Fq6.add(ctx, w4, w6)
    c0 = Fq6.sub(ctx, w5, w7)
    c1 = Fq6.double(ctx, w4)
    return Fq12Wire(c0, c1)


@component(name="fq12.inverse_montgomery")
def _inverse_montgomery(ctx, a: Fq12Wire) -> Fq12Wire:
    """(fq12.rs:413-429)."""
    a_c0_sq = Fq6.square_montgomery(ctx, a.c0)
    a_c1_sq = Fq6.square_montgomery(ctx, a.c1)
    a_c1_sq_beta = Fq6.mul_by_nonresidue(ctx, a_c1_sq)
    norm = Fq6.sub(ctx, a_c0_sq, a_c1_sq_beta)
    inv_norm = Fq6.inverse_montgomery(ctx, norm)
    res_c0 = Fq6.mul_montgomery(ctx, a.c0, inv_norm)
    neg_c1 = Fq6.neg(ctx, a.c1)
    res_c1 = Fq6.mul_montgomery(ctx, inv_norm, neg_c1)
    return Fq12Wire(res_c0, res_c1)


Fq12 = Fq12Ops
