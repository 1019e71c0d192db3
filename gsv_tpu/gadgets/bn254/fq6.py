"""Fq6 (cubic-over-quadratic) circuit gadgets.

Reference parity: ``src/gadgets/bn254/fq6.rs`` — Toom-Cook-style 5-mult
multiply (evaluations at {0, 1, -1, 2, inf} followed by ``div6``), sparse
``mul_by_01`` line multiplications, CH-SQR2 squaring, norm-based inverse and
frobenius via constant multiplies.
"""

from __future__ import annotations

from gsv_tpu.bn254_host.field import FROB_FQ6_C1, FROB_FQ6_C2, Fq2 as HostFq2, Fq6 as HostFq6
from gsv_tpu.circuit.wires import WireStruct
from gsv_tpu.gadgets.bn254.fq2 import Fq2, Fq2Wire


class Fq6Wire(WireStruct):
    __slots__ = ("c0", "c1", "c2")

    def __init__(self, c0: Fq2Wire, c1: Fq2Wire, c2: Fq2Wire):
        self.c0 = c0
        self.c1 = c1
        self.c2 = c2

    @classmethod
    def from_ctx(cls, ctx) -> "Fq6Wire":
        return cls(Fq2Wire.from_ctx(ctx), Fq2Wire.from_ctx(ctx), Fq2Wire.from_ctx(ctx))

    @classmethod
    def new_constant(cls, v: HostFq6) -> "Fq6Wire":
        return cls(
            Fq2Wire.new_constant(v.c0),
            Fq2Wire.new_constant(v.c1),
            Fq2Wire.new_constant(v.c2),
        )

    def wires_flatten(self):
        return [self.c0, self.c1, self.c2], None

    @classmethod
    def wires_unflatten(cls, aux, children):
        return cls(*children)


class Fq6Ops:
    @staticmethod
    def equal_constant(ctx, a: Fq6Wire, b: HostFq6) -> int:
        u = Fq2.equal_constant(ctx, a.c0, b.c0)
        v = Fq2.equal_constant(ctx, a.c1, b.c1)
        w = Fq2.equal_constant(ctx, a.c2, b.c2)
        uv = ctx.and_(u, v)
        return ctx.and_(uv, w)

    @staticmethod
    def add(ctx, a, b):
        return Fq6Wire(
            Fq2.add(ctx, a.c0, b.c0), Fq2.add(ctx, a.c1, b.c1), Fq2.add(ctx, a.c2, b.c2)
        )

    @staticmethod
    def neg(ctx, a):
        return Fq6Wire(Fq2.neg(ctx, a.c0), Fq2.neg(ctx, a.c1), Fq2.neg(ctx, a.c2))

    @staticmethod
    def sub(ctx, a, b):
        return Fq6Wire(
            Fq2.sub(ctx, a.c0, b.c0), Fq2.sub(ctx, a.c1, b.c1), Fq2.sub(ctx, a.c2, b.c2)
        )

    @staticmethod
    def double(ctx, a):
        return Fq6Wire(
            Fq2.double(ctx, a.c0), Fq2.double(ctx, a.c1), Fq2.double(ctx, a.c2)
        )

    @staticmethod
    def triple(ctx, a):
        return Fq6Wire(
            Fq2.triple(ctx, a.c0), Fq2.triple(ctx, a.c1), Fq2.triple(ctx, a.c2)
        )

    @staticmethod
    def div6(ctx, a):
        return Fq6Wire(Fq2.div6(ctx, a.c0), Fq2.div6(ctx, a.c1), Fq2.div6(ctx, a.c2))

    @staticmethod
    def mul_montgomery(ctx, a: Fq6Wire, b: Fq6Wire) -> Fq6Wire:
        """5-mult Toom-Cook multiply + div6 (fq6.rs:194-259)."""
        v0 = Fq2.mul_montgomery(ctx, a.c0, b.c0)

        w2 = Fq2.add(ctx, a.c0, a.c2)
        w3 = Fq2.add(ctx, w2, a.c1)
        w4 = Fq2.sub(ctx, w2, a.c1)
        w5 = Fq2.double(ctx, a.c1)
        w6 = Fq2.double(ctx, a.c2)
        w7 = Fq2.double(ctx, w6)
        w8 = Fq2.add(ctx, a.c0, w5)
        w9 = Fq2.add(ctx, w8, w7)

        w10 = Fq2.add(ctx, b.c0, b.c2)
        w11 = Fq2.add(ctx, w10, b.c1)
        w12 = Fq2.sub(ctx, w10, b.c1)
        w13 = Fq2.double(ctx, b.c1)
        w14 = Fq2.double(ctx, b.c2)
        w15 = Fq2.double(ctx, w14)
        w16 = Fq2.add(ctx, b.c0, w13)
        w17 = Fq2.add(ctx, w16, w15)

        v1 = Fq2.mul_montgomery(ctx, w3, w11)
        v2 = Fq2.mul_montgomery(ctx, w4, w12)
        v3 = Fq2.mul_montgomery(ctx, w9, w17)
        v4 = Fq2.mul_montgomery(ctx, a.c2, b.c2)

        return Fq6Ops._mul_tail(ctx, v0, v1, v2, v3, v4)

    @staticmethod
    def _mul_tail(ctx, v0, v1, v2, v3, v4) -> Fq6Wire:
        v2_2 = Fq2.double(ctx, v2)
        v0_3 = Fq2.triple(ctx, v0)
        v1_3 = Fq2.triple(ctx, v1)
        v2_3 = Fq2.triple(ctx, v2)
        v4_3 = Fq2.triple(ctx, v4)
        v0_6 = Fq2.double(ctx, v0_3)
        v1_6 = Fq2.double(ctx, v1_3)
        v4_6 = Fq2.double(ctx, v4_3)
        v4_12 = Fq2.double(ctx, v4_6)

        w18 = Fq2.sub(ctx, v0_3, v1_3)
        w19 = Fq2.sub(ctx, w18, v2)
        w20 = Fq2.add(ctx, w19, v3)
        w21 = Fq2.sub(ctx, w20, v4_12)
        w22 = Fq2.mul_by_nonresidue(ctx, w21)
        c0 = Fq2.add(ctx, w22, v0_6)

        w23 = Fq2.sub(ctx, v1_6, v0_3)
        w24 = Fq2.sub(ctx, w23, v2_2)
        w25 = Fq2.sub(ctx, w24, v3)
        w26 = Fq2.add(ctx, w25, v4_12)
        w27 = Fq2.mul_by_nonresidue(ctx, v4_6)
        c1 = Fq2.add(ctx, w26, w27)

        w28 = Fq2.sub(ctx, v1_3, v0_6)
        w29 = Fq2.add(ctx, w28, v2_3)
        c2 = Fq2.sub(ctx, w29, v4_6)

        return Fq6Ops.div6(ctx, Fq6Wire(c0, c1, c2))

    @staticmethod
    def mul_by_constant_montgomery(ctx, a: Fq6Wire, b: HostFq6) -> Fq6Wire:
        """Same evaluation scheme with constant b (fq6.rs:262-324)."""
        v0 = Fq2.mul_by_constant_montgomery(ctx, a.c0, b.c0)

        w2 = Fq2.add(ctx, a.c0, a.c2)
        w3 = Fq2.add(ctx, w2, a.c1)
        w4 = Fq2.sub(ctx, w2, a.c1)
        w5 = Fq2.double(ctx, a.c1)
        w6 = Fq2.double(ctx, a.c2)
        w7 = Fq2.double(ctx, w6)
        w8 = Fq2.add(ctx, a.c0, w5)
        w9 = Fq2.add(ctx, w8, w7)

        v1 = Fq2.mul_by_constant_montgomery(ctx, w3, b.c0 + b.c1 + b.c2)
        v2 = Fq2.mul_by_constant_montgomery(ctx, w4, b.c0 - b.c1 + b.c2)
        v3 = Fq2.mul_by_constant_montgomery(
            ctx, w9, b.c0 + b.c1.double() + b.c2.double().double()
        )
        v4 = Fq2.mul_by_constant_montgomery(ctx, a.c2, b.c2)

        return Fq6Ops._mul_tail(ctx, v0, v1, v2, v3, v4)

    @staticmethod
    def mul_by_fq2_montgomery(ctx, a: Fq6Wire, b: Fq2Wire) -> Fq6Wire:
        return Fq6Wire(
            Fq2.mul_montgomery(ctx, a.c0, b),
            Fq2.mul_montgomery(ctx, a.c1, b),
            Fq2.mul_montgomery(ctx, a.c2, b),
        )

    @staticmethod
    def mul_by_constant_fq2_montgomery(ctx, a: Fq6Wire, b: HostFq2) -> Fq6Wire:
        return Fq6Wire(
            Fq2.mul_by_constant_montgomery(ctx, a.c0, b),
            Fq2.mul_by_constant_montgomery(ctx, a.c1, b),
            Fq2.mul_by_constant_montgomery(ctx, a.c2, b),
        )

    @staticmethod
    def mul_by_nonresidue(ctx, a: Fq6Wire) -> Fq6Wire:
        u = Fq2.mul_by_nonresidue(ctx, a.c2)
        return Fq6Wire(u, a.c0, a.c1)

    @staticmethod
    def mul_by_01_montgomery(ctx, a: Fq6Wire, c0: Fq2Wire, c1: Fq2Wire) -> Fq6Wire:
        """Sparse (c0 + c1 v) multiply (fq6.rs:351-379)."""
        w1 = Fq2.mul_montgomery(ctx, a.c0, c0)
        w2 = Fq2.mul_montgomery(ctx, a.c1, c1)
        w3 = Fq2.add(ctx, a.c1, a.c2)
        w4 = Fq2.mul_montgomery(ctx, w3, c1)
        w5 = Fq2.sub(ctx, w4, w2)
        w6 = Fq2.mul_by_nonresidue(ctx, w5)
        w7 = Fq2.add(ctx, w6, w1)
        w8 = Fq2.add(ctx, a.c0, a.c1)
        w9 = Fq2.add(ctx, c0, c1)
        w10 = Fq2.mul_montgomery(ctx, w8, w9)
        w11 = Fq2.sub(ctx, w10, w1)
        w12 = Fq2.sub(ctx, w11, w2)
        w13 = Fq2.add(ctx, a.c0, a.c2)
        w14 = Fq2.mul_montgomery(ctx, w13, c0)
        w15 = Fq2.sub(ctx, w14, w1)
        w16 = Fq2.add(ctx, w15, w2)
        return Fq6Wire(w7, w12, w16)

    @staticmethod
    def mul_by_01_constant1_montgomery(
        ctx, a: Fq6Wire, c0: Fq2Wire, c1: HostFq2
    ) -> Fq6Wire:
        """Sparse multiply with constant c1 (fq6.rs:381-410)."""
        w1 = Fq2.mul_montgomery(ctx, a.c0, c0)
        w2 = Fq2.mul_by_constant_montgomery(ctx, a.c1, c1)
        w3 = Fq2.add(ctx, a.c1, a.c2)
        w4 = Fq2.mul_by_constant_montgomery(ctx, w3, c1)
        w5 = Fq2.sub(ctx, w4, w2)
        w6 = Fq2.mul_by_nonresidue(ctx, w5)
        w7 = Fq2.add(ctx, w6, w1)
        w8 = Fq2.add(ctx, a.c0, a.c1)
        w9 = Fq2.add_constant(ctx, c0, c1)
        w10 = Fq2.mul_montgomery(ctx, w8, w9)
        w11 = Fq2.sub(ctx, w10, w1)
        w12 = Fq2.sub(ctx, w11, w2)
        w13 = Fq2.add(ctx, a.c0, a.c2)
        w14 = Fq2.mul_montgomery(ctx, w13, c0)
        w15 = Fq2.sub(ctx, w14, w1)
        w16 = Fq2.add(ctx, w15, w2)
        return Fq6Wire(w7, w12, w16)

    @staticmethod
    def square_montgomery(ctx, a: Fq6Wire) -> Fq6Wire:
        """CH-SQR2 (eprint 2006/471; fq6.rs:420-448)."""
        s0 = Fq2.square_montgomery(ctx, a.c0)
        w1 = Fq2.add(ctx, a.c0, a.c2)
        w2 = Fq2.add(ctx, w1, a.c1)
        w3 = Fq2.sub(ctx, w1, a.c1)
        s1 = Fq2.square_montgomery(ctx, w2)
        s2 = Fq2.square_montgomery(ctx, w3)
        w4 = Fq2.mul_montgomery(ctx, a.c1, a.c2)
        s3 = Fq2.double(ctx, w4)
        s4 = Fq2.square_montgomery(ctx, a.c2)
        w5 = Fq2.add(ctx, s1, s2)
        t1 = Fq2.half(ctx, w5)

        w6 = Fq2.mul_by_nonresidue(ctx, s3)
        res_c0 = Fq2.add(ctx, s0, w6)
        w7 = Fq2.mul_by_nonresidue(ctx, s4)
        w8 = Fq2.sub(ctx, s1, s3)
        w9 = Fq2.sub(ctx, w8, t1)
        res_c1 = Fq2.add(ctx, w9, w7)
        w10 = Fq2.sub(ctx, t1, s0)
        res_c2 = Fq2.sub(ctx, w10, s4)
        return Fq6Wire(res_c0, res_c1, res_c2)

    @staticmethod
    def inverse_montgomery(ctx, r: Fq6Wire) -> Fq6Wire:
        """Norm-based inverse (fq6.rs:450-487)."""
        a, b, c = r.c0, r.c1, r.c2
        a_sq = Fq2.square_montgomery(ctx, a)
        b_sq = Fq2.square_montgomery(ctx, b)
        c_sq = Fq2.square_montgomery(ctx, c)
        ab = Fq2.mul_montgomery(ctx, a, b)
        ac = Fq2.mul_montgomery(ctx, a, c)
        bc = Fq2.mul_montgomery(ctx, b, c)
        bc_beta = Fq2.mul_by_nonresidue(ctx, bc)
        t0 = Fq2.sub(ctx, a_sq, bc_beta)
        c_sq_beta = Fq2.mul_by_nonresidue(ctx, c_sq)
        t1 = Fq2.sub(ctx, c_sq_beta, ab)
        t2 = Fq2.sub(ctx, b_sq, ac)
        w1 = Fq2.mul_montgomery(ctx, t1, c)
        w2 = Fq2.mul_montgomery(ctx, t2, b)
        w12 = Fq2.add(ctx, w1, w2)
        w3 = Fq2.mul_by_nonresidue(ctx, w12)
        w4 = Fq2.mul_montgomery(ctx, a, t0)
        norm = Fq2.add(ctx, w4, w3)
        inv_norm = Fq2.inverse_montgomery(ctx, norm)
        return Fq6Wire(
            Fq2.mul_montgomery(ctx, t0, inv_norm),
            Fq2.mul_montgomery(ctx, t1, inv_norm),
            Fq2.mul_montgomery(ctx, t2, inv_norm),
        )

    @staticmethod
    def frobenius_montgomery(ctx, a: Fq6Wire, i: int) -> Fq6Wire:
        """Componentwise Fq2 frobenius + constant multiplies (fq6.rs:489-515)."""
        f0 = Fq2.frobenius_montgomery(ctx, a.c0, i)
        f1 = Fq2.frobenius_montgomery(ctx, a.c1, i)
        f2 = Fq2.frobenius_montgomery(ctx, a.c2, i)
        c1_coef = _as_mont_fq2(FROB_FQ6_C1[i % 6])
        c2_coef = _as_mont_fq2(FROB_FQ6_C2[i % 6])
        f1u = Fq2.mul_by_constant_montgomery(ctx, f1, c1_coef)
        f2u = Fq2.mul_by_constant_montgomery(ctx, f2, c2_coef)
        return Fq6Wire(f0, f1u, f2u)


def _as_mont_fq2(v: HostFq2) -> HostFq2:
    from gsv_tpu.gadgets.bn254.fq import FqWire
    from gsv_tpu.bn254_host.field import Fq as HostFq

    return HostFq2(
        HostFq(FqWire.as_montgomery(int(v.c0))), HostFq(FqWire.as_montgomery(int(v.c1)))
    )


Fq6 = Fq6Ops
