"""Pairing circuit gadgets: line evaluation, Miller loops.

Reference parity: ``src/gadgets/bn254/pairing.rs`` — constant-Q line
evaluation against host-precomputed coefficients, variable-Q in-circuit
line computation (projective double/add in place), and the 3-pair Groth16
Miller loop ``multi_miller_loop_groth16_evaluate_montgomery_fast``
(pairing.rs:944-1009).
"""

from __future__ import annotations

from gsv_tpu.bn254_host.curve import G2
from gsv_tpu.bn254_host.field import Fq2 as HostFq2, Fq12 as HostFq12
from gsv_tpu.bn254_host.pairing import (
    TWIST_MUL_BY_Q_X,
    TWIST_MUL_BY_Q_Y,
    ate_loop_count,
    ell_coeffs,
)
from gsv_tpu.bn254_host.curve import B2
from gsv_tpu.circuit.builder import component
from gsv_tpu.gadgets.bn254.fq import Fq, FqWire
from gsv_tpu.gadgets.bn254.fq2 import Fq2, Fq2Wire
from gsv_tpu.gadgets.bn254.fq6 import Fq6Wire, _as_mont_fq2
from gsv_tpu.gadgets.bn254.fq12 import Fq12, Fq12Wire
from gsv_tpu.gadgets.bn254.g1 import G1Wire
from gsv_tpu.gadgets.bn254.g2 import G2Ops, G2Wire


def new_fq12_constant_montgomery(v: HostFq12) -> Fq12Wire:
    """Constant Fq12 wires in Montgomery form (pairing.rs:700-745)."""
    return Fq12Wire.new_constant(v)


def ell_eval_const(ctx, f: Fq12Wire, coeffs: tuple, p: G1Wire) -> Fq12Wire:
    """Line with constant coefficients at variable P (pairing.rs:134-150).

    ``coeffs``: host (c0, c1, c2) Fq2 triple in standard form.
    """
    c0_fq2 = Fq2.mul_constant_by_fq_montgomery(ctx, coeffs[0], p.y)
    c3_fq2 = Fq2.mul_constant_by_fq_montgomery(ctx, coeffs[1], p.x)
    c4_const = _as_mont_fq2(coeffs[2])
    return Fq12.mul_by_034_constant4_montgomery(ctx, f, c0_fq2, c3_fq2, c4_const)


# the groth16 loop's ell_by_constant_montgomery (pairing.rs:923-942) is the
# same construction
ell_by_constant_montgomery = ell_eval_const


def ell_montgomery(ctx, f: Fq12Wire, coeffs: Fq6Wire, p: G1Wire) -> Fq12Wire:
    """Variable-coefficients line at affine P (pairing.rs:160-168)."""
    c0_fq2 = Fq2.mul_by_fq_montgomery(ctx, coeffs.c0, p.y)
    c3_fq2 = Fq2.mul_by_fq_montgomery(ctx, coeffs.c1, p.x)
    return Fq12.mul_by_034_montgomery(ctx, f, c0_fq2, c3_fq2, coeffs.c2)


def g1_normalize_to_affine(ctx, p: G1Wire) -> G1Wire:
    """(x, y, z) -> (x/z^2, y/z^3, 1) (pairing.rs:170-183)."""
    inv_z = Fq.inverse_montgomery(ctx, p.z)
    inv_z2 = Fq.square_montgomery(ctx, inv_z)
    inv_z3 = Fq.mul_montgomery(ctx, inv_z2, inv_z)
    x = Fq.mul_montgomery(ctx, p.x, inv_z2)
    y = Fq.mul_montgomery(ctx, p.y, inv_z3)
    z = FqWire.new_constant(1)
    return G1Wire(x, y, z)


def g2_normalize_to_affine(ctx, q: G2Wire) -> G2Wire:
    inv_z = Fq2.inverse_montgomery(ctx, q.z)
    inv_z2 = Fq2.square_montgomery(ctx, inv_z)
    inv_z3 = Fq2.mul_montgomery(ctx, inv_z2, inv_z)
    x = Fq2.mul_montgomery(ctx, q.x, inv_z2)
    y = Fq2.mul_montgomery(ctx, q.y, inv_z3)
    z = Fq2Wire(FqWire.new_constant(1), FqWire.new_constant(0))
    return G2Wire(x, y, z)


@component(name="pairing.double_in_place")
def double_in_place_circuit_montgomery(ctx, r: G2Wire):
    """Projective doubling with line coeffs (pairing.rs:359-420)."""
    rx, ry, rz = r.x, r.y, r.z
    a = Fq2.mul_montgomery(ctx, rx, ry)
    a = Fq2.half(ctx, a)
    b = Fq2.square_montgomery(ctx, ry)
    c = Fq2.square_montgomery(ctx, rz)
    c_triple = Fq2.triple(ctx, c)
    e = Fq2.mul_by_constant_montgomery(ctx, c_triple, _as_mont_fq2(B2))
    f = Fq2.triple(ctx, e)
    g = Fq2.add(ctx, b, f)
    g = Fq2.half(ctx, g)
    ryrz = Fq2.add(ctx, ry, rz)
    ryrzs = Fq2.square_montgomery(ctx, ryrz)
    bc = Fq2.add(ctx, b, c)
    h = Fq2.sub(ctx, ryrzs, bc)
    i = Fq2.sub(ctx, e, b)
    j = Fq2.square_montgomery(ctx, rx)
    es = Fq2.square_montgomery(ctx, e)
    j_triple = Fq2.triple(ctx, j)
    bf = Fq2.sub(ctx, b, f)
    new_x = Fq2.mul_montgomery(ctx, a, bf)
    es_triple = Fq2.triple(ctx, es)
    gs = Fq2.square_montgomery(ctx, g)
    new_y = Fq2.sub(ctx, gs, es_triple)
    new_z = Fq2.mul_montgomery(ctx, b, h)
    hn = Fq2.neg(ctx, h)
    return G2Wire(new_x, new_y, new_z), Fq6Wire(hn, j_triple, i)


@component(name="pairing.add_in_place")
def add_in_place_montgomery(ctx, r: G2Wire, q: G2Wire):
    """Mixed addition with line coeffs (pairing.rs:412-464); q affine."""
    rx, ry, rz = r.x, r.y, r.z
    qx, qy = q.x, q.y
    w1 = Fq2.mul_montgomery(ctx, qy, rz)
    theta = Fq2.sub(ctx, ry, w1)
    w2 = Fq2.mul_montgomery(ctx, qx, rz)
    lam = Fq2.sub(ctx, rx, w2)
    c = Fq2.square_montgomery(ctx, theta)
    d = Fq2.square_montgomery(ctx, lam)
    e = Fq2.mul_montgomery(ctx, lam, d)
    f = Fq2.mul_montgomery(ctx, rz, c)
    g = Fq2.mul_montgomery(ctx, rx, d)
    w3 = Fq2.add(ctx, e, f)
    w4 = Fq2.double(ctx, g)
    h = Fq2.sub(ctx, w3, w4)
    neg_theta = Fq2.neg(ctx, theta)
    w5 = Fq2.mul_montgomery(ctx, theta, qx)
    w6 = Fq2.mul_montgomery(ctx, lam, qy)
    j = Fq2.sub(ctx, w5, w6)
    new_x = Fq2.mul_montgomery(ctx, lam, h)
    w7 = Fq2.sub(ctx, g, h)
    w8 = Fq2.mul_montgomery(ctx, theta, w7)
    w9 = Fq2.mul_montgomery(ctx, e, ry)
    new_y = Fq2.sub(ctx, w8, w9)
    new_z = Fq2.mul_montgomery(ctx, rz, e)
    return G2Wire(new_x, new_y, new_z), Fq6Wire(lam, neg_theta, j)


def g2_affine_neg_evaluate(ctx, q: G2Wire) -> G2Wire:
    return G2Wire(q.x, Fq2.neg(ctx, q.y), q.z)


@component(name="pairing.mul_by_char")
def mul_by_char_montgomery(ctx, r: G2Wire) -> G2Wire:
    """(pairing.rs:476-500)."""
    s_x = Fq2.frobenius_montgomery(ctx, r.x, 1)
    s_x = Fq2.mul_by_constant_montgomery(ctx, s_x, _as_mont_fq2(TWIST_MUL_BY_Q_X))
    s_y = Fq2.frobenius_montgomery(ctx, r.y, 1)
    s_y = Fq2.mul_by_constant_montgomery(ctx, s_y, _as_mont_fq2(TWIST_MUL_BY_Q_Y))
    return G2Wire(s_x, s_y, r.z)


def ell_coeffs_montgomery(ctx, q: G2Wire) -> list[Fq6Wire]:
    """In-circuit ate-loop line coefficients for variable Q (pairing.rs:507-545)."""
    neg_q = g2_affine_neg_evaluate(ctx, q)
    ellc: list[Fq6Wire] = []
    r = q
    digits = ate_loop_count()
    for bit in reversed(digits[:-1]):
        r, coeffs = double_in_place_circuit_montgomery(ctx, r)
        ellc.append(coeffs)
        if bit == 1:
            r, coeffs = add_in_place_montgomery(ctx, r, q)
            ellc.append(coeffs)
        elif bit == -1:
            r, coeffs = add_in_place_montgomery(ctx, r, neg_q)
            ellc.append(coeffs)
    q1 = mul_by_char_montgomery(ctx, q)
    q2 = mul_by_char_montgomery(ctx, q1)
    q2 = g2_affine_neg_evaluate(ctx, q2)
    r, coeffs = add_in_place_montgomery(ctx, r, q1)
    ellc.append(coeffs)
    _r, coeffs = add_in_place_montgomery(ctx, r, q2)
    ellc.append(coeffs)
    return ellc


def _loop_digits():
    """(bit index, squaring?, extra-add?) schedule shared by all loops."""
    digits = ate_loop_count()
    n = len(digits)
    steps = []
    for i in range(n - 1, 0, -1):
        steps.append((i != n - 1, digits[i - 1]))
    return steps


@component(offcircuit=("q_key",), name="pairing.miller_loop_const_q_affine")
def miller_loop_const_q_affine(ctx, p: G1Wire, *, q_key: tuple) -> Fq12Wire:
    """Miller loop with constant Q, affine P (pairing.rs:549-583)."""
    q = _g2_from_key(q_key)
    coeffs = ell_coeffs(q)
    it = iter(coeffs)
    f = new_fq12_constant_montgomery(HostFq12.one())
    for do_square, bit in _loop_digits():
        if do_square:
            f = Fq12.square_montgomery(ctx, f)
        f = ell_eval_const(ctx, f, next(it), p)
        if bit in (1, -1):
            f = ell_eval_const(ctx, f, next(it), p)
    f = ell_eval_const(ctx, f, next(it), p)
    f = ell_eval_const(ctx, f, next(it), p)
    return f


def _g2_from_key(q_key: tuple) -> G2:
    from gsv_tpu.bn254_host.field import Fq as HostFq

    return G2(
        HostFq2(HostFq(q_key[0]), HostFq(q_key[1])),
        HostFq2(HostFq(q_key[2]), HostFq(q_key[3])),
    )


def g2_key(q: G2) -> tuple:
    return (int(q.x.c0), int(q.x.c1), int(q.y.c0), int(q.y.c1))


def multi_miller_loop_montgomery_fast(ctx, ps: list[G1Wire], qs: list[G2Wire]) -> Fq12Wire:
    """All-variable multi Miller loop (pairing.rs:640-699); inputs affine."""
    qells = [ell_coeffs_montgomery(ctx, q) for q in qs]
    per_step = list(zip(*qells))
    it = iter(per_step)
    f = new_fq12_constant_montgomery(HostFq12.one())
    for do_square, bit in _loop_digits():
        if do_square:
            f = Fq12.square_montgomery(ctx, f)
        for c, p in zip(next(it), ps):
            f = ell_montgomery(ctx, f, c, p)
        if bit in (1, -1):
            for c, p in zip(next(it), ps):
                f = ell_montgomery(ctx, f, c, p)
    for _ in range(2):
        for c, p in zip(next(it), ps):
            f = ell_montgomery(ctx, f, c, p)
    return f


@component(offcircuit=("q1_key", "q2_key"), name="pairing.multi_miller_loop_groth16")
def multi_miller_loop_groth16_evaluate_montgomery_fast(
    ctx,
    p1: G1Wire,
    p2: G1Wire,
    p3: G1Wire,
    q3: G2Wire,
    *,
    q1_key: tuple,
    q2_key: tuple,
) -> Fq12Wire:
    """The Groth16 verifier's 3-pair loop (pairing.rs:944-1009):
    (p1, const q1), (p2, const q2), (p3, variable q3)."""
    q1ell = ell_coeffs(_g2_from_key(q1_key))
    q2ell = ell_coeffs(_g2_from_key(q2_key))
    q3ell = ell_coeffs_montgomery(ctx, q3)
    i1, i2, i3 = iter(q1ell), iter(q2ell), iter(q3ell)
    f = new_fq12_constant_montgomery(HostFq12.one())

    def step(f):
        f = ell_by_constant_montgomery(ctx, f, next(i1), p1)
        f = ell_by_constant_montgomery(ctx, f, next(i2), p2)
        f = ell_montgomery(ctx, f, next(i3), p3)
        return f

    for do_square, bit in _loop_digits():
        if do_square:
            f = Fq12.square_montgomery(ctx, f)
        f = step(f)
        if bit in (1, -1):
            f = step(f)
    f = step(f)
    f = step(f)
    return f
