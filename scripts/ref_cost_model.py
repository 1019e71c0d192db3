"""Analytic gate-cost model of the reference Groth16 verifier circuit.

This is a *transcription of the reference's Rust gadget code into exact gate
counts* — every function below mirrors one reference function (file:line
cited) and adds precisely the gates that function emits.  Constants matter:
`mul_by_constant` costs popcount(c)*(5n-3), `add_constant` depends on the
lowest set bit, and the `mul_by_constant_montgomery` early-returns on 0/R are
modeled — so the model is evaluated with the *actual* vk/proof constants.

Purpose (VERDICT r1 Missing #1 / Weak #5): an executable cost model that
predicts the reference's total for our vk/proof.  Agreement with our traced
census (scripts/gate_census.py) at every stage proves our circuit is
structurally identical to the reference's *current* source; the model is the
instrument that localizes any future parity break.

Validated exact matches vs trace (see PARITY.md):
  bigint.mul_karatsuba(254) = 183,326; fq12.mul_by_034 = 16,815,242;
  double_in_place ~ 10.12M; and the stage totals below.

Usage: python scripts/ref_cost_model.py [-k 6] [--compressed]
"""

import argparse
import sys

sys.path.insert(0, ".")

import importlib

hf = importlib.import_module("gsv_tpu.bn254_host.field")
# the package re-exports a `pairing` *function*, which shadows the submodule
# under plain `import ... as` syntax
hp = importlib.import_module("gsv_tpu.bn254_host.pairing")
from gsv_tpu.bn254_host.curve import B2
from gsv_tpu.bn254_host.field import Fq as HFq
from gsv_tpu.bn254_host.field import Fq2 as HFq2
from gsv_tpu.bn254_host.groth16 import dummy_proof
from gsv_tpu.gadgets.bn254.fp254 import FQ_PARAMS

P = FQ_PARAMS.modulus
R = FQ_PARAMS.mont_r % P  # montgomery R mod p (reference MONTGOMERY_R = 2^254 mod p)
N = 254


def as_mont(v: int) -> int:
    return (int(v) * FQ_PARAMS.mont_r) % P


def pop(c: int) -> int:
    return bin(int(c)).count("1")


def first_one(c: int) -> int:
    c = int(c)
    assert c > 0
    return (c & -c).bit_length() - 1


class G:
    """Gate counter with named checkpoints."""

    total = 0

    @classmethod
    def add(cls, n):
        cls.total += n

    @classmethod
    def mark(cls):
        return cls.total


# ---------------------------------------------------------------- bigint
# (src/gadgets/bigint/{add,cmp,mul}.rs)


def bi_add(n):  # add.rs:9 — half_adder + (n-1) full_adders -> n+1 bits
    G.add(2 + 5 * (n - 1))


def bi_add_without_carry(n):  # add.rs:28
    bi_add(n)


def bi_add_constant(n, c):  # add.rs:39 — cost: 1 + 2*(n-1-first_one)
    assert c != 0
    G.add(1 + 2 * (n - 1 - first_one(c)))


def bi_add_constant_without_carry(n, c):  # add.rs:84 (same gates, drops carry)
    bi_add_constant(n, c)


def bi_sub(n):  # add.rs:95
    G.add(2 + 5 * (n - 1))


def bi_sub_without_borrow(n):  # add.rs:117
    bi_sub(n)


def bi_greater_than(n):  # cmp.rs:110 — n NOTs + add(n)
    G.add(n)
    bi_add(n)


def bi_less_than_constant(n, c):  # cmp.rs:132 — n NOTs + add_constant
    G.add(n)
    bi_add_constant(n, c)


def bi_equal_constant(n, c):  # cmp.rs:61 — n-1 gates (c != 0), else equal_zero
    if int(c) == 0:
        bi_equal_zero(n)
    else:
        G.add(n - 1)


def bi_equal_zero(n):  # cmp.rs:88 — 1 xnor + (n-1) and-variants
    G.add(1 if n == 1 else n)


def bi_equal(n):  # cmp.rs:44 — n XOR + equal_zero
    G.add(n)
    bi_equal_zero(n)


def bi_select(n):  # cmp.rs:154 — 3 gates/bit
    G.add(3 * n)


def bi_self_or_zero(n):  # cmp.rs:11 — 1 AND/bit
    G.add(n)


def bi_multiplexer(n_bits, w):  # cmp.rs:172 — (2^w - 1) selectors per bit
    G.add(n_bits * 3 * ((1 << w) - 1))


def bi_half(n):  # add.rs:143 — free shift
    pass


def bi_double_without_overflow(n):  # add.rs:135 — free shift
    pass


def bi_odd_part(n):  # add.rs:155 — 2*(n-1) chain gates + n selects of width n
    G.add(2 * (n - 1))
    for _ in range(n):
        bi_select(n)


def _use_kara(length):  # mul.rs:8 — pre-computed decision
    return length != 21 and length > 19


def bi_mul_naive(n):  # mul.rs:20 — n rows of (n ANDs + add(n))
    G.add(n * n)
    for _ in range(n):
        bi_add(n)


def bi_mul_karatsuba(n):  # mul.rs:58
    if n < 5:
        bi_mul_naive(n)
        return
    n0, n1 = n // 2, (n + 1) // 2
    (bi_mul_karatsuba if _use_kara(n0) else bi_mul_naive)(n0)
    (bi_mul_karatsuba if _use_kara(n1) else bi_mul_naive)(n1)
    bi_add(n1)  # sum_a
    bi_add(n1)  # sum_b
    bi_add(2 * n1)  # sq_sum
    (bi_mul_karatsuba if _use_kara(n1 + 1) else bi_mul_naive)(n1 + 1)  # sum_mul
    bi_sub_without_borrow(2 * (n1 + 1))  # cross_term
    bi_add(n + 1)  # new_segment
    bi_add(2 * n1)  # new_segment2


def bi_mul(n):  # mul.rs:185
    (bi_mul_karatsuba if _use_kara(n) else bi_mul_naive)(n)


def bi_mul_by_constant(n, c):  # mul.rs:209 — one add(n) per set bit
    for _ in range(pop(c)):
        bi_add(n)


def bi_mul_by_constant_modulo_power_two(n, c, power):  # mul.rs:242
    for i in range(min(int(c).bit_length(), power)):
        if (int(c) >> i) & 1:
            nb = min(power - i, n)
            if nb:
                bi_add(nb)


# ---------------------------------------------------------------- Fq
# (src/gadgets/bn254/fp254impl.rs, fq.rs)

NOT_P = (1 << N) - P
HALF_P = pow(2, -1, P)
ONE_THIRD_P = pow(3, -1, P)
TWO_THIRD_P = (2 * ONE_THIRD_P) % P
M_INV = FQ_PARAMS.m_inverse  # p^-1 mod 2^254


def fq_add():  # fp254impl.rs:96
    bi_add(N)
    bi_add_constant(N, NOT_P)
    bi_less_than_constant(N, P)
    G.add(1)
    bi_select(N)


def fq_add_constant(c):  # fp254impl.rs:115 (c standard-form int, 0 -> free)
    c = int(c) % P
    if c == 0:
        return
    bi_add_constant(N, c)
    bi_add_constant(N, NOT_P)
    bi_less_than_constant(N, P)
    G.add(1)
    bi_select(N)


def fq_neg():  # fp254impl.rs:153 — n XORs with TRUE + add_constant
    G.add(N)
    fq_add_constant((1 - NOT_P) % P)


def fq_sub():  # fp254impl.rs:143
    fq_neg()
    fq_add()


def fq_double():  # fp254impl.rs:170
    bi_add_constant(N, NOT_P)
    bi_less_than_constant(N, P)
    G.add(1)
    bi_select(N)


def fq_half():  # fp254impl.rs:193
    bi_add_constant_without_carry(N, HALF_P)
    bi_select(N)


def fq_triple():  # fp254impl.rs:728
    fq_double()
    fq_add()


def fq_div6():  # fp254impl.rs:735
    fq_half()
    G.add(N * 6)
    bi_add_constant_without_carry(N, ONE_THIRD_P)
    bi_select(N)
    bi_add_constant_without_carry(N, TWO_THIRD_P)
    bi_select(N)


def fq_montgomery_reduce():  # fp254impl.rs:304
    bi_mul_by_constant_modulo_power_two(N, M_INV, N)
    bi_mul_by_constant(N, P)
    bi_greater_than(N)
    bi_self_or_zero(N)
    bi_sub_without_borrow(N)
    bi_sub_without_borrow(N)


def fq_mul():  # fp254impl.rs:216
    bi_mul(N)
    fq_montgomery_reduce()


def fq_square():  # fp254impl.rs:285
    fq_mul()


def fq_mul_by_constant_montgomery(c):  # fp254impl.rs:252 (c as passed, verbatim)
    c = int(c)
    if c == 0 or c == R:  # ZERO / as_montgomery(ONE) early returns
        return
    bi_mul_by_constant(N, c)
    fq_montgomery_reduce()


def fq_equal_constant(c):  # fp254impl.rs:87
    bi_equal_constant(N, int(c))


def fq_multiplexer(w):  # fp254impl.rs:795
    bi_multiplexer(N, w)


def fq_inverse():  # fp254impl.rs:335 — streaming binary ext-Euclid
    bi_odd_part(N)
    fq_neg()
    for _ in range(2 * N):  # main loop, 508 iterations
        bi_greater_than(N)
        G.add(4)  # p2/p3/p4 selector gates
        # part1..4
        bi_add_constant_without_carry(N, 1)  # k1
        bi_add_constant_without_carry(N, 1)  # k2
        bi_sub_without_borrow(N)  # u3
        bi_add_without_carry(N)  # r3
        bi_add_constant_without_carry(N, 1)  # k3
        bi_sub_without_borrow(N)  # v4
        bi_add_without_carry(N)  # s4
        bi_add_constant_without_carry(N, 1)  # k4
        for _ in range(5):  # new u/v/r/s/k
            for _ in range(4):
                bi_self_or_zero(N)
            for _ in range(3):
                bi_add_without_carry(N)
        bi_equal_constant(N, 1)  # v_equals_one
        for _ in range(5):
            bi_select(N)
    for _ in range(N):  # divide_result_by_even_part, 254 iterations
        fq_half()
        fq_half()
        bi_equal_constant(N, 1)
        bi_select(N)
        bi_select(N)
    for _ in range(2 * N):  # divide_result_by_2^k, 508 iterations
        fq_half()
        fq_add_constant(P - 1)  # Fq::add_constant(k, -1)
        fq_equal_constant(0)  # Fq::equal_constant(k, ZERO) -> equal_zero
        bi_select(N)
        bi_select(N)


def fq_inverse_montgomery():  # fp254impl.rs:680
    fq_inverse()
    fq_mul_by_constant_montgomery(pow(R, 3, P))


def fq_exp_by_constant_montgomery(exp):  # fp254impl.rs:693
    exp = int(exp)
    if exp in (0, 1):
        return
    bits = bin(exp)[2:]  # MSB..LSB
    for b in bits[1:]:
        fq_square()
        if b == "1":
            fq_mul()


# ---------------------------------------------------------------- Fq2
# (src/gadgets/bn254/fq2.rs) — values carried as host Fq2 where needed


def fq2_add():
    fq_add()
    fq_add()


def fq2_add_constant(c: HFq2):  # fq2.rs:170 (component values as passed)
    fq_add_constant(c.c0)
    fq_add_constant(c.c1)


def fq2_sub():
    fq_sub()
    fq_sub()


def fq2_neg():
    fq_neg()
    fq_neg()


def fq2_double():
    fq_double()
    fq_double()


def fq2_half():
    fq_half()
    fq_half()


def fq2_triple():
    fq2_double()
    fq2_add()


def fq2_mul():  # fq2.rs:230 — 3 muls + 3 adds + 2 subs
    fq_add()
    fq_add()
    fq_mul()
    fq_mul()
    fq_mul()
    fq_sub()
    fq_add()
    fq_sub()


def fq2_mul_by_constant(c: HFq2):  # fq2.rs:257 (c as passed)
    if int(c.c0) == 1 and int(c.c1) == 0:
        return  # ONE early return (fq2.rs:265)
    fq_add()
    fq_mul_by_constant_montgomery(c.c0)
    fq_mul_by_constant_montgomery(c.c1)
    fq_mul_by_constant_montgomery((int(c.c0) + int(c.c1)) % P)
    fq_sub()
    fq_add()
    fq_sub()


def fq2_mul_by_fq():  # fq2.rs:283 — 2 muls
    fq_mul()
    fq_mul()


def fq2_mul_constant_by_fq(c: HFq2):  # fq2.rs:307 — consts as_montgomery'd inside
    fq_mul_by_constant_montgomery(as_mont(c.c0))
    fq_mul_by_constant_montgomery(as_mont(c.c1))


def fq2_mul_by_nonresidue():  # fq2.rs:324
    fq_triple()
    fq_triple()
    fq_triple()
    fq_triple()
    fq_sub()
    fq_add()


def fq2_square():  # fq2.rs:341
    fq_add()
    fq_sub()
    fq_mul()
    fq_mul()
    fq_double()


def fq2_inverse():  # fq2.rs:357
    fq_square()
    fq_square()
    fq_add()
    fq_inverse_montgomery()
    fq_mul()
    fq_neg()
    fq_mul()


def fq2_frobenius(i):  # fq2.rs:376 — c1 * FP2_C1[i%2] (1 or p-1), as_montgomery'd
    coef = 1 if i % 2 == 0 else P - 1
    fq_mul_by_constant_montgomery(as_mont(coef))


def fq2_div6():
    fq_div6()
    fq_div6()


# ---------------------------------------------------------------- Fq6
# (src/gadgets/bn254/fq6.rs)


def fq6_add():
    for _ in range(3):
        fq2_add()


def fq6_sub():
    for _ in range(3):
        fq2_sub()


def fq6_neg():
    for _ in range(3):
        fq2_neg()


def fq6_double():
    for _ in range(3):
        fq2_double()


def fq6_div6():
    for _ in range(3):
        fq2_div6()


def fq6_mul_by_nonresidue():  # fq6.rs:346
    fq2_mul_by_nonresidue()


def _fq6_mul_tail():  # fq6.rs:229-258 interpolation + div6
    fq2_double()  # v2_2
    fq2_triple()  # v0_3
    fq2_triple()  # v1_3
    fq2_triple()  # v2_3
    fq2_triple()  # v4_3
    fq2_double()  # v0_6
    fq2_double()  # v1_6
    fq2_double()  # v4_6
    fq2_double()  # v4_12
    fq2_sub()  # w18
    fq2_sub()  # w19
    fq2_add()  # w20
    fq2_sub()  # w21
    fq2_mul_by_nonresidue()  # w22
    fq2_add()  # c0
    fq2_sub()  # w23
    fq2_sub()  # w24
    fq2_sub()  # w25
    fq2_add()  # w26
    fq2_mul_by_nonresidue()  # w27
    fq2_add()  # c1
    fq2_sub()  # w28
    fq2_add()  # w29
    fq2_sub()  # c2
    fq6_div6()


def _fq6_mul_prep_one_side():  # fq6.rs:204-211 (a-side evaluation points)
    fq2_add()  # w2
    fq2_add()  # w3
    fq2_sub()  # w4
    fq2_double()  # w5
    fq2_double()  # w6
    fq2_double()  # w7
    fq2_add()  # w8
    fq2_add()  # w9


def fq6_mul():  # fq6.rs:194 — Toom-3: 5 fq2 muls + prep + tail
    fq2_mul()  # v0
    _fq6_mul_prep_one_side()
    _fq6_mul_prep_one_side()
    for _ in range(4):  # v1..v4
        fq2_mul()
    _fq6_mul_tail()


def fq6_mul_by_constant(c: HFq2 and object):  # fq6.rs:263 (host Fq6 c, as passed)
    fq2_mul_by_constant(c.c0)  # v0
    _fq6_mul_prep_one_side()
    # constant-side eval points are host-computed (no gates); v1..v4:
    c0, c1, c2 = c.c0, c.c1, c.c2
    w10 = c0 + c2
    fq2_mul_by_constant(w10 + c1)  # v1
    fq2_mul_by_constant(w10 - c1)  # v2
    fq2_mul_by_constant(c0 + c1.double() + c2.double().double())  # v3
    fq2_mul_by_constant(c2)  # v4
    _fq6_mul_tail()


def fq6_square():  # fq6.rs:421
    fq2_square()  # s0
    fq2_add()
    fq2_add()
    fq2_sub()
    fq2_square()  # s1
    fq2_square()  # s2
    fq2_mul()  # a_c1*a_c2
    fq2_double()  # s3
    fq2_square()  # s4
    fq2_add()
    fq2_half()  # t1
    fq2_mul_by_nonresidue()
    fq2_add()  # c0
    fq2_mul_by_nonresidue()
    fq2_sub()
    fq2_sub()
    fq2_add()  # c1
    fq2_sub()
    fq2_sub()  # c2


def fq6_mul_by_01():  # fq6.rs:351 — 5 fq2 muls
    fq2_mul()  # w1
    fq2_mul()  # w2
    fq2_add()
    fq2_mul()  # w4
    fq2_sub()
    fq2_mul_by_nonresidue()
    fq2_add()
    fq2_add()
    fq2_add()  # w9
    fq2_mul()  # w10
    fq2_sub()
    fq2_sub()
    fq2_add()
    fq2_mul()  # w14
    fq2_sub()
    fq2_add()


def fq6_mul_by_01_constant1(c1: HFq2):  # fq6.rs:381 (c1 as passed — montgomery)
    fq2_mul()  # w1
    fq2_mul_by_constant(c1)  # w2
    fq2_add()
    fq2_mul_by_constant(c1)  # w4
    fq2_sub()
    fq2_mul_by_nonresidue()
    fq2_add()
    fq2_add()
    fq2_add_constant(c1)  # w9
    fq2_mul()  # w10
    fq2_sub()
    fq2_sub()
    fq2_add()
    fq2_mul()  # w14
    fq2_sub()
    fq2_add()


def fq6_mul_by_fq2():  # fq6.rs:326
    for _ in range(3):
        fq2_mul()


def fq6_mul_by_constant_fq2(c: HFq2):  # fq6.rs:334
    for _ in range(3):
        fq2_mul_by_constant(c)


def fq6_inverse():  # fq6.rs:451
    fq2_square()
    fq2_square()
    fq2_square()
    fq2_mul()
    fq2_mul()
    fq2_mul()
    fq2_mul_by_nonresidue()
    fq2_sub()
    fq2_mul_by_nonresidue()
    fq2_sub()
    fq2_sub()
    fq2_mul()  # wires_1
    fq2_mul()  # wires_2
    fq2_add()
    fq2_mul_by_nonresidue()
    fq2_mul()  # wires_4
    fq2_add()
    fq2_inverse()
    fq2_mul()
    fq2_mul()
    fq2_mul()


def fq6_frobenius(i):  # fq6.rs:489
    fq2_frobenius(i)
    fq2_frobenius(i)
    fq2_frobenius(i)
    fq2_mul_by_constant(_as_mont_fq2(hf.FROB_FQ6_C1[i % 6]))
    fq2_mul_by_constant(_as_mont_fq2(hf.FROB_FQ6_C2[i % 6]))


def fq6_equal_constant(c):  # 3 x fq2 -> 6 x fq + 5 ANDs
    for part in (c.c0, c.c1, c.c2):
        fq_equal_constant(as_mont(part.c0))
        fq_equal_constant(as_mont(part.c1))
    G.add(5)


def _as_mont_fq2(c: HFq2) -> HFq2:
    return HFq2(HFq(as_mont(c.c0)), HFq(as_mont(c.c1)))


# ---------------------------------------------------------------- Fq12
# (src/gadgets/bn254/fq12.rs)


def fq12_mul():  # fq12.rs:199
    fq6_add()
    fq6_add()
    fq6_mul()
    fq6_mul()
    fq6_add()
    fq6_mul()
    fq6_mul_by_nonresidue()
    fq6_add()
    fq6_sub()


def fq12_square():  # fq12.rs:312
    fq6_add()
    fq6_mul_by_nonresidue()
    fq6_add()
    fq6_mul()
    fq6_mul()
    fq6_mul_by_nonresidue()
    fq6_add()
    fq6_sub()
    fq6_double()


def fq12_mul_by_034(c4_const: HFq2 | None = None):  # fq12.rs:268 / :288
    if c4_const is None:
        fq6_mul_by_01()
    else:
        fq6_mul_by_01_constant1(c4_const)
    fq6_mul_by_nonresidue()
    fq6_mul_by_fq2()
    fq6_add()
    fq6_add()
    fq2_add()
    if c4_const is None:
        fq6_mul_by_01()
    else:
        fq6_mul_by_01_constant1(c4_const)
    fq6_add()
    fq6_sub()


def fq12_inverse():  # fq12.rs:414
    fq6_square()
    fq6_square()
    fq6_mul_by_nonresidue()
    fq6_sub()
    fq6_inverse()
    fq6_mul()
    fq6_neg()
    fq6_mul()


def fq12_frobenius(i):  # fq12.rs:430
    fq6_frobenius(i)
    fq6_frobenius(i)
    fq6_mul_by_constant_fq2(_as_mont_fq2(hf.FROB_FQ12_C1[i % 12]))


def fq12_conjugate():  # fq12.rs:444
    fq6_neg()


def fq12_equal_constant(c):  # fq12.rs:158
    fq6_equal_constant(c.c0)
    fq6_equal_constant(c.c1)
    G.add(1)


# ---------------------------------------------------------------- G1
# (src/gadgets/bn254/g1.rs)


def g1_add():  # g1.rs:160
    fq_square()
    fq_square()
    fq_mul()
    fq_mul()
    fq_mul()
    fq_mul()
    fq_mul()
    fq_mul()
    fq_sub()
    fq_sub()
    fq_square()
    fq_mul()
    fq_mul()
    fq_square()
    fq_add()
    fq_double()
    fq_sub()
    fq_sub()
    fq_mul()
    fq_mul()
    fq_sub()
    fq_mul()
    fq_mul()
    fq_equal_constant(0)
    fq_equal_constant(0)
    fq_multiplexer(2)
    fq_multiplexer(2)
    fq_multiplexer(2)


def g1_multiplexer(w):  # g1.rs:276
    fq_multiplexer(w)
    fq_multiplexer(w)
    fq_multiplexer(w)


def g1_scalar_mul_by_constant_base(w=10):  # g1.rs:309
    index = 0
    n_adds = -1
    while index < N:
        wi = min(w, N - index)
        g1_multiplexer(wi)
        n_adds += 1
        index += w
    for _ in range(n_adds):
        g1_add()


def g1_msm(n_scalars, w=10):  # g1.rs:371
    for _ in range(n_scalars):
        g1_scalar_mul_by_constant_base(w)
    for _ in range(n_scalars - 1):
        g1_add()


# ---------------------------------------------------------------- G2 / pairing
# (src/gadgets/bn254/pairing.rs)

AS_MONT_B2 = _as_mont_fq2(B2)


def g2_double_in_place():  # pairing.rs:359
    fq2_mul()  # a
    fq2_half()
    fq2_square()  # b
    fq2_square()  # c
    fq2_triple()  # c_triple
    fq2_mul_by_constant(AS_MONT_B2)  # e
    fq2_triple()  # f
    fq2_add()  # g
    fq2_half()
    fq2_add()  # ryrz
    fq2_square()  # ryrzs
    fq2_add()  # bc
    fq2_sub()  # h
    fq2_sub()  # i
    fq2_square()  # j
    fq2_square()  # es
    fq2_triple()  # j_triple
    fq2_sub()  # bf
    fq2_mul()  # new_x
    fq2_triple()  # es_triple
    fq2_square()  # gs
    fq2_sub()  # new_y
    fq2_mul()  # new_z
    fq2_neg()  # hn


def g2_add_in_place():  # pairing.rs:410
    fq2_mul()  # wires_1
    fq2_sub()  # theta
    fq2_mul()  # wires_2
    fq2_sub()  # lambda
    fq2_square()  # c
    fq2_square()  # d
    fq2_mul()  # e
    fq2_mul()  # f
    fq2_mul()  # g
    fq2_add()  # wires_3
    fq2_double()  # wires_4
    fq2_sub()  # h
    fq2_neg()  # neg_theta
    fq2_mul()  # wires_5
    fq2_mul()  # wires_6
    fq2_sub()  # j
    fq2_mul()  # new_r_x
    fq2_sub()  # wires_7
    fq2_mul()  # wires_8
    fq2_mul()  # wires_9
    fq2_sub()  # new_r_y
    fq2_mul()  # new_r_z


def g2_neg_evaluate():  # pairing.rs:448
    fq2_neg()


def g2_mul_by_char():  # pairing.rs:456
    fq2_frobenius(1)
    fq2_mul_by_constant(_as_mont_fq2(hp.TWIST_MUL_BY_Q_X))
    fq2_frobenius(1)
    fq2_mul_by_constant(_as_mont_fq2(hp.TWIST_MUL_BY_Q_Y))


def ell_coeffs_montgomery():  # pairing.rs:507
    g2_neg_evaluate()
    for bit in reversed(hp.ate_loop_count()[:-1]):
        g2_double_in_place()
        if bit != 0:
            g2_add_in_place()
    g2_mul_by_char()
    g2_mul_by_char()
    g2_neg_evaluate()
    g2_add_in_place()
    g2_add_in_place()


def ell_by_constant_montgomery(coeffs):  # pairing.rs:923 — (c0,c1,c2) host Fq2s
    c0, c1, c2 = coeffs
    fq2_mul_constant_by_fq(c0)
    fq2_mul_constant_by_fq(c1)
    fq12_mul_by_034(c4_const=_as_mont_fq2(c2))


def ell_montgomery():  # pairing.rs:160
    fq2_mul_by_fq()
    fq2_mul_by_fq()
    fq12_mul_by_034(c4_const=None)


def multi_miller_loop_groth16(q1ell, q2ell):  # pairing.rs:945
    ell_coeffs_montgomery()  # q3 wires
    it1, it2 = iter(q1ell), iter(q2ell)
    loop = hp.ate_loop_count()
    for i in range(len(loop) - 1, 0, -1):
        if i != len(loop) - 1:
            fq12_square()
        ell_by_constant_montgomery(next(it1))
        ell_by_constant_montgomery(next(it2))
        ell_montgomery()
        if loop[i - 1] != 0:
            ell_by_constant_montgomery(next(it1))
            ell_by_constant_montgomery(next(it2))
            ell_montgomery()
    for _ in range(2):
        ell_by_constant_montgomery(next(it1))
        ell_by_constant_montgomery(next(it2))
        ell_montgomery()


# ---------------------------------------------------------------- final exp
# (src/gadgets/bn254/final_exponentiation.rs)


def cyclotomic_exp():  # final_exponentiation.rs:65
    fq12_inverse()
    found = False
    for v in reversed(hp.find_naf(hp.BN_X)):
        if found:
            fq12_cyclotomic_square_exact()
        if v != 0:
            found = True
            fq12_mul()


def exp_by_neg_x():  # final_exponentiation.rs:95
    cyclotomic_exp()
    fq12_conjugate()


def final_exponentiation():  # final_exponentiation.rs:101
    fq12_inverse()
    fq12_conjugate()
    fq12_mul()  # u
    fq12_frobenius(2)
    fq12_mul()  # r
    exp_by_neg_x()  # y0
    fq12_square()  # y1
    fq12_square()  # y2
    fq12_mul()  # y3
    exp_by_neg_x()  # y4
    fq12_square()  # y5
    exp_by_neg_x()  # y6
    fq12_conjugate()  # y7
    fq12_conjugate()  # y8
    fq12_mul()  # y9
    fq12_mul()  # y10
    fq12_mul()  # y11
    fq12_mul()  # y12
    fq12_mul()  # y13
    fq12_frobenius(1)  # y14
    fq12_mul()  # y15
    fq12_frobenius(2)  # y16
    fq12_mul()  # y17
    fq12_conjugate()  # r2
    fq12_mul()  # y18
    fq12_frobenius(3)  # y19
    fq12_mul()  # final


# exact cyclotomic square (fq12.rs:327-408): 3 blocks + recombination


def fq12_cyclotomic_square_exact():
    for _ in range(3):
        fq2_mul()  # xy
        fq2_add()  # x_plus_y
        fq2_mul_by_nonresidue()  # y_beta
        fq2_add()  # x_plus_y_beta
        fq2_mul_by_nonresidue()  # xy_beta
        fq2_mul()  # w1
        fq2_add()  # w2
        fq2_sub()  # t_even
        fq2_double()  # t_odd
    # recombination (fq12.rs:367-391): 3x (sub,double,add), one nonresidue,
    # then 3x (add,double,add)
    for _ in range(3):
        fq2_sub()
        fq2_double()
        fq2_add()
    fq2_mul_by_nonresidue()  # t5_beta
    for _ in range(3):
        fq2_add()
        fq2_double()
        fq2_add()


# ---------------------------------------------------------------- Groth16
# (src/gadgets/groth16.rs)


def projective_to_affine():  # groth16.rs:27
    fq_inverse_montgomery()
    fq_square()
    fq_mul()
    fq_mul()
    fq_mul()


def groth16_verify(vk, n_public, alpha_beta_mont):  # groth16.rs:57
    marks = {}
    g1_msm(n_public, w=10)
    marks["msm"] = G.mark()
    g1_add()
    marks["g1add"] = G.mark()
    projective_to_affine()
    marks["p2a"] = G.mark()
    q1 = -vk.gamma_g2
    q2 = -vk.delta_g2
    q1ell = hp.ell_coeffs(q1)
    q2ell = hp.ell_coeffs(q2)
    multi_miller_loop_groth16(q1ell, q2ell)
    marks["miller"] = G.mark()
    final_exponentiation()
    marks["finalexp"] = G.mark()
    fq12_equal_constant(alpha_beta_mont)
    marks["equal"] = G.mark()
    return marks


def decompress_g1():  # groth16.rs:116
    fq_square()
    fq_mul()
    fq_add_constant(as_mont(B_G1_COEFF))
    fq_exp_by_constant_montgomery((P + 1) // 4)  # sqrt (fq.rs:291)
    fq_neg()
    bi_select(N)


B_G1_COEFF = 3


def fq_is_qnr():  # fq.rs:177 — exp((p-1)/2) + equal_constant(as_mont(-1))
    fq_exp_by_constant_montgomery((P - 1) // 2)
    bi_equal(N)  # bigint::equal vs constant wires (fq.rs:184-189)


def fq2_sqrt_general():  # fq2.rs:426
    fq_square()
    fq_square()
    fq_add()  # norm
    fq_exp_by_constant_montgomery((P + 1) // 4)  # alpha_sqrt
    fq_add()  # delta_plus
    fq_half()
    fq_is_qnr()
    fq_sub()
    bi_select(N)
    fq_exp_by_constant_montgomery((P + 1) // 4)  # c0_final
    fq_inverse_montgomery()
    fq_half()
    fq_mul()


def decompress_g2():  # groth16.rs:146
    fq2_square()
    fq2_mul()
    fq2_add_constant(AS_MONT_B2)
    fq2_sqrt_general()
    fq2_neg()
    bi_select(N)
    bi_select(N)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-k", type=int, default=6)
    ap.add_argument("--compressed", action="store_true")
    args = ap.parse_args()

    vk, proof, publics = dummy_proof(k=args.k, seed=0)

    # host alpha_beta = e(alpha, -beta)^-1 (groth16.rs:99-107)
    ab = hp.multi_pairing([(vk.alpha_g1, -vk.beta_g2)]).inv()
    ab_mont = ab  # equal_constant compares as_montgomery'd components

    if args.compressed:
        decompress_g1()
        decompress_g2()
        decompress_g1()
        print(f"decompression: {G.total:>15,}")
    marks = groth16_verify(vk, len(publics), ab_mont)
    prev = 0
    for name, v in marks.items():
        print(f"{name:10s} {v - prev:>15,}  (cum {v:,})")
        prev = v
    print(f"TOTAL      {G.total:>15,}")
    print("reference badge (uncompressed k=6): 11,174,708,821")
    print("our traced census: 10,683,587,487 (uncompressed) / "
          "11,456,302,131 (compressed)")


if __name__ == "__main__":
    main()
