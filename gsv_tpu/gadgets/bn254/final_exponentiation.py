"""Final exponentiation circuit gadget.

Reference parity: ``src/gadgets/bn254/final_exponentiation.rs`` — easy part
f^(p^6-1)(p^2+1) via inverse+conjugate+frobenius, hard part via three
``exp_by_neg_x`` cyclotomic NAF chains and the standard y0..y19 ladder.
"""

from __future__ import annotations

from gsv_tpu.bn254_host.field import BN_X, Fq12 as HostFq12
from gsv_tpu.bn254_host.pairing import find_naf
from gsv_tpu.circuit.builder import component
from gsv_tpu.gadgets.bn254.fq12 import Fq12, Fq12Wire
from gsv_tpu.gadgets.bn254.pairing import new_fq12_constant_montgomery


def cyclotomic_exp_fast_inverse_montgomery_fast(ctx, f: Fq12Wire) -> Fq12Wire:
    """f^X over the NAF of X with a precomputed inverse
    (final_exponentiation.rs:65-93)."""
    res = new_fq12_constant_montgomery(HostFq12.one())
    f_inverse = Fq12.inverse_montgomery(ctx, f)
    found_nonzero = False
    for value in reversed(find_naf(BN_X)):
        if found_nonzero:
            res = Fq12.cyclotomic_square_montgomery(ctx, res)
        if value != 0:
            found_nonzero = True
            if value > 0:
                res = Fq12.mul_montgomery(ctx, res, f)
            else:
                res = Fq12.mul_montgomery(ctx, res, f_inverse)
    return res


def exp_by_neg_x_montgomery(ctx, f: Fq12Wire) -> Fq12Wire:
    f2 = cyclotomic_exp_fast_inverse_montgomery_fast(ctx, f)
    return Fq12.conjugate(ctx, f2)


@component(name="final_exponentiation_montgomery")
def final_exponentiation_montgomery(ctx, f: Fq12Wire) -> Fq12Wire:
    """(final_exponentiation.rs:100-131)."""
    f_inv = Fq12.inverse_montgomery(ctx, f)
    f_conj = Fq12.conjugate(ctx, f)
    u = Fq12.mul_montgomery(ctx, f_inv, f_conj)
    u_frob = Fq12.frobenius_montgomery(ctx, u, 2)
    r = Fq12.mul_montgomery(ctx, u_frob, u)

    y0 = exp_by_neg_x_montgomery(ctx, r)
    y1 = Fq12.square_montgomery(ctx, y0)
    y2 = Fq12.square_montgomery(ctx, y1)
    y3 = Fq12.mul_montgomery(ctx, y1, y2)
    y4 = exp_by_neg_x_montgomery(ctx, y3)
    y5 = Fq12.square_montgomery(ctx, y4)
    y6 = exp_by_neg_x_montgomery(ctx, y5)
    y7 = Fq12.conjugate(ctx, y3)
    y8 = Fq12.conjugate(ctx, y6)
    y9 = Fq12.mul_montgomery(ctx, y8, y4)
    y10 = Fq12.mul_montgomery(ctx, y9, y7)
    y11 = Fq12.mul_montgomery(ctx, y10, y1)
    y12 = Fq12.mul_montgomery(ctx, y10, y4)
    y13 = Fq12.mul_montgomery(ctx, y12, r)
    y14 = Fq12.frobenius_montgomery(ctx, y11, 1)
    y15 = Fq12.mul_montgomery(ctx, y14, y13)
    y16 = Fq12.frobenius_montgomery(ctx, y10, 2)
    y17 = Fq12.mul_montgomery(ctx, y16, y15)
    r2 = Fq12.conjugate(ctx, r)
    y18 = Fq12.mul_montgomery(ctx, r2, y11)
    y19 = Fq12.frobenius_montgomery(ctx, y18, 3)
    return Fq12.mul_montgomery(ctx, y19, y17)
