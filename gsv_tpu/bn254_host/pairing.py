"""BN254 optimal-ate pairing (host side), formula-compatible with arkworks.

Mirrors the off-circuit helpers of ``src/gadgets/bn254/pairing.rs``:
``double_in_place`` / ``add_in_place`` (projective G2 line functions,
pairing.rs:30-73), ``mul_by_char`` (pairing.rs:75-83), ``ell_coeffs``
(pairing.rs:88-132), and the native final exponentiation of
``src/gadgets/bn254/final_exponentiation.rs:13-63``.

The ate loop digits are the standard NAF of 6x+2 (x = BN parameter),
verified by construction in tests.
"""

from __future__ import annotations

from dataclasses import dataclass

from gsv_tpu.bn254_host.curve import B2, G1, G2
from gsv_tpu.bn254_host.field import BN_X, Fq, Fq2, Fq6, Fq12, P, XI

HALF = Fq(2).inv()

# Frobenius twist constants (arkworks TWIST_MUL_BY_Q_X / _Y)
TWIST_MUL_BY_Q_X = XI.pow((P - 1) // 3)
TWIST_MUL_BY_Q_Y = XI.pow((P - 1) // 2)


def find_naf(n: int) -> list[int]:
    """Standard non-adjacent form, least-significant digit first
    (ark_ff::biginteger::arithmetic::find_naf)."""
    digits = []
    while n:
        if n & 1:
            d = 2 - (n % 4)
            n -= d
        else:
            d = 0
        digits.append(d)
        n //= 2
    return digits


# ark-bn254's hardcoded ATE_LOOP_COUNT: signed digits of 6x+2, LSB first.
# NOTE: this is NOT the standard NAF (it contains adjacent nonzero digits);
# the digit pattern is load-bearing for gate counts and ciphertext parity
# because the Miller loop's add-step structure follows it exactly.
# Validated: sum(d_i * 2^i) == 6*BN_X + 2 (see tests).
ATE_LOOP_COUNT = [
    0, 0, 0, 1, 0, 1, 0, -1, 0, 0, 1, -1, 0, 0, 1, 0, 0, 1, 1, 0, -1, 0, 0, 1,
    0, -1, 0, 0, 0, 0, 1, 1, 1, 0, 0, -1, 0, 0, 1, 0, 0, 0, 0, 0, -1, 0, 0, 1,
    1, 0, 0, -1, 0, 0, 0, 1, 1, 0, -1, 0, 0, 1, 0, 1, 1,
]

assert sum(d * (1 << i) for i, d in enumerate(ATE_LOOP_COUNT)) == 6 * BN_X + 2


def ate_loop_count() -> list[int]:
    """Signed digits of 6x+2, LSB first (ark_bn254 ATE_LOOP_COUNT)."""
    return list(ATE_LOOP_COUNT)


@dataclass
class G2Proj:
    x: Fq2
    y: Fq2
    z: Fq2


def double_in_place(r: G2Proj) -> tuple[Fq2, Fq2, Fq2]:
    """One Miller doubling step; returns line coeffs (c0, c1, c2)
    = (-h, 3j, i) — pairing.rs:30-52."""
    a = r.x * r.y * HALF
    b = r.y.square()
    c = r.z.square()
    e = B2 * (c.double() + c)
    f = e.double() + e
    g = (b + f) * HALF
    h = (r.y + r.z).square() - (b + c)
    i = e - b
    j = r.x.square()
    e_square = e.square()
    r.x = a * (b - f)
    r.y = g.square() - (e_square.double() + e_square)
    r.z = b * h
    return (-h, j.double() + j, i)


def add_in_place(r: G2Proj, q: G2) -> tuple[Fq2, Fq2, Fq2]:
    """One Miller addition step; returns (lambda, -theta, j) — pairing.rs:54-73."""
    theta = r.y - (q.y * r.z)
    lam = r.x - (q.x * r.z)
    c = theta.square()
    d = lam.square()
    e = lam * d
    f = r.z * c
    g = r.x * d
    h = e + f - g.double()
    j = theta * q.x - (lam * q.y)
    r.x = lam * h
    r.y = theta * (g - h) - (e * r.y)
    r.z = r.z * e
    return (lam, -theta, j)


def mul_by_char(r: G2) -> G2:
    """Frobenius endomorphism on the twist (pairing.rs:75-83)."""
    x = r.x.frobenius(1) * TWIST_MUL_BY_Q_X
    y = r.y.frobenius(1) * TWIST_MUL_BY_Q_Y
    return G2(x, y)


def ell_coeffs(q: G2) -> list[tuple[Fq2, Fq2, Fq2]]:
    """Line coefficients for the full ate loop of constant Q (pairing.rs:88-132)."""
    assert not q.is_infinity
    coeffs = []
    r = G2Proj(q.x, q.y, Fq2.one())
    neg_q = -q
    digits = ate_loop_count()
    for bit in reversed(digits[:-1]):
        coeffs.append(double_in_place(r))
        if bit == 1:
            coeffs.append(add_in_place(r, q))
        elif bit == -1:
            coeffs.append(add_in_place(r, neg_q))
    q1 = mul_by_char(q)
    q2 = mul_by_char(q1)
    q2 = G2(q2.x, -q2.y)
    coeffs.append(add_in_place(r, q1))
    coeffs.append(add_in_place(r, q2))
    return coeffs


def ell(f: Fq12, coeff: tuple[Fq2, Fq2, Fq2], p: G1) -> Fq12:
    """Evaluate a line at P and multiply into f (sparse 034 mult)."""
    c0 = coeff[0] * p.y
    c1 = coeff[1] * p.x
    return f.mul_by_034(c0, c1, coeff[2])


def multi_miller_loop(pairs: list[tuple[G1, G2]]) -> Fq12:
    """Product of Miller loops (arkworks multi_miller_loop semantics)."""
    pairs = [(p, q) for p, q in pairs if not p.is_infinity and not q.is_infinity]
    coeff_iters = [iter(ell_coeffs(q)) for _, q in pairs]
    f = Fq12.one()
    digits = ate_loop_count()
    for idx, bit in enumerate(reversed(digits[:-1])):
        if idx:
            f = f.square()
        for (p, _), it in zip(pairs, coeff_iters):
            f = ell(f, next(it), p)
        if bit in (1, -1):
            for (p, _), it in zip(pairs, coeff_iters):
                f = ell(f, next(it), p)
    for (p, _), it in zip(pairs, coeff_iters):
        f = ell(f, next(it), p)
    for (p, _), it in zip(pairs, coeff_iters):
        f = ell(f, next(it), p)
    return f


def miller_loop(p: G1, q: G2) -> Fq12:
    return multi_miller_loop([(p, q)])


def cyclotomic_exp(f: Fq12) -> Fq12:
    """f^X by plain square-and-multiply over the bits of X
    (final_exponentiation.rs:17-32)."""
    res = Fq12.one()
    for bit in bin(BN_X)[2:]:
        res = res.square()  # no-op on the leading 1 (res == 1)
        if bit == "1":
            res = res * f
    return res


def exp_by_neg_x(f: Fq12) -> Fq12:
    return cyclotomic_exp(f).conjugate()


def final_exponentiation(f: Fq12) -> Fq12:
    """Easy + hard part (final_exponentiation.rs:38-63)."""
    u = f.inv() * f.conjugate()
    r = u.frobenius(2) * u
    y0 = exp_by_neg_x(r)
    y1 = y0.square()
    y2 = y1.square()
    y3 = y2 * y1
    y4 = exp_by_neg_x(y3)
    y5 = y4.square()
    y6 = exp_by_neg_x(y5)
    y7 = y3.conjugate()
    y8 = y6.conjugate()
    y9 = y8 * y4
    y10 = y9 * y7
    y11 = y10 * y1
    y12 = y10 * y4
    y13 = y12 * r
    y14 = y11.frobenius(1)
    y15 = y14 * y13
    y16 = y10.frobenius(2)
    y17 = y16 * y15
    r2 = r.conjugate()
    y18 = r2 * y11
    y19 = y18.frobenius(3)
    return y19 * y17


def pairing(p: G1, q: G2) -> Fq12:
    return final_exponentiation(miller_loop(p, q))


def multi_pairing(pairs: list[tuple[G1, G2]]) -> Fq12:
    return final_exponentiation(multi_miller_loop(pairs))
