"""254-bit prime-field circuit gadgets (Montgomery form).

Reference parity: ``src/gadgets/bn254/fp254impl.rs`` — the shared field core
behind Fq and Fr: modular add/sub/neg/double/half/triple/div6, Montgomery
multiply/reduce (R = 2^254), the 508-iteration streaming binary
extended-Euclid inverse (chunked 4 iterations per cached child component,
fp254impl.rs:333-680), and constant exponentiation.

Each gadget takes a ``FieldParams`` off-circuit parameter carrying the
modulus and derived constants; the reference reaches them through the
``Fp254Impl`` trait's ``Self``.  NOTE: we fold the modulus into every
component cache key — the reference's trait-method keys don't include it
(fp254impl.rs keys are shared between Fq and Fr), which is only sound
because no single reference circuit mixes both fields.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property

from gsv_tpu.core.gate_types import GateType
from gsv_tpu.circuit.builder import FALSE_WIRE, component
from gsv_tpu.gadgets import basic, bigint
from gsv_tpu.gadgets.bigint import BigIntWires


@dataclass(frozen=True)
class FieldParams:
    """Field constants (Fp254Impl's associated consts, fp254impl.rs:18-75)."""

    modulus: int
    n_bits: int = 254

    @cached_property
    def mont_r(self) -> int:
        return 1 << self.n_bits

    @cached_property
    def m_inverse(self) -> int:
        """MODULUS^-1 mod R (used to derive q in Montgomery reduction)."""
        return pow(self.modulus, -1, self.mont_r)

    @cached_property
    def r_inverse(self) -> int:
        return pow(self.mont_r, -1, self.modulus)

    @cached_property
    def not_modulus(self) -> int:
        return self.mont_r - self.modulus

    @cached_property
    def half_modulus(self) -> int:
        return pow(2, -1, self.modulus)

    @cached_property
    def one_third_modulus(self) -> int:
        return pow(3, -1, self.modulus)

    @cached_property
    def two_third_modulus(self) -> int:
        return (2 * self.one_third_modulus) % self.modulus

    @cached_property
    def modulus_add_1_div_4(self) -> int:
        return (self.modulus + 1) // 4

    def to_mont(self, a: int) -> int:
        return (a * self.mont_r) % self.modulus

    def from_mont(self, a: int) -> int:
        return (a * self.r_inverse) % self.modulus

    def to_key_bytes(self) -> bytes:
        return self.modulus.to_bytes(32, "little")


FQ_PARAMS = FieldParams(
    21888242871839275222246405745257275088696311157297823662689037894645226208583
)
FR_PARAMS = FieldParams(
    21888242871839275222246405745257275088548364400416034343698204186575808495617
)


def equal_constant(ctx, a: BigIntWires, b: int, *, fp: FieldParams) -> int:
    return bigint.equal_constant(ctx, a, b=b % fp.modulus)


@component(offcircuit=("fp",), name="fp254.add")
def add(ctx, a: BigIntWires, b: BigIntWires, *, fp: FieldParams) -> BigIntWires:
    """(a + b) mod p via conditional-subtract (fp254impl.rs:95-117)."""
    assert len(a) == fp.n_bits and len(b) == fp.n_bits
    wires1 = bigint.add(ctx, a, b)
    u = wires1.pop()
    wires2 = bigint.add_constant(ctx, wires1, b=fp.not_modulus)
    wires2.pop()
    v = bigint.less_than_constant(ctx, wires1, b=fp.modulus)
    s = ctx.and_variant(u, v, (True, False, False))
    return bigint.select(ctx, wires1, wires2, s)


@component(offcircuit=("b", "fp"), name="fp254.add_constant")
def add_constant(ctx, a: BigIntWires, *, b: int, fp: FieldParams) -> BigIntWires:
    """(a + const) mod p (fp254impl.rs:119-141)."""
    assert len(a) == fp.n_bits
    b = b % fp.modulus
    if b == 0:
        return a.clone()
    wires1 = bigint.add_constant(ctx, a, b=b)
    u = wires1.pop()
    wires2 = bigint.add_constant(ctx, wires1, b=fp.not_modulus)
    wires2.pop()
    v = bigint.less_than_constant(ctx, wires1, b=fp.modulus)
    s = ctx.and_variant(u, v, (True, False, False))
    return bigint.select(ctx, wires1, wires2, s)


@component(offcircuit=("fp",), name="fp254.sub")
def sub(ctx, a: BigIntWires, b: BigIntWires, *, fp: FieldParams) -> BigIntWires:
    neg_b = neg(ctx, b, fp=fp)
    return add(ctx, a, neg_b, fp=fp)


@component(offcircuit=("fp",), name="fp254.neg")
def neg(ctx, a: BigIntWires, *, fp: FieldParams) -> BigIntWires:
    """(-a) mod p: bitwise NOT then constant fix-up (fp254impl.rs:153-168)."""
    assert len(a) == fp.n_bits
    not_a = BigIntWires([ctx.gate(GateType.XOR, a_i, ctx.TRUE) for a_i in a.bits])
    return add_constant(ctx, not_a, b=(1 - fp.not_modulus) % fp.modulus, fp=fp)


@component(offcircuit=("fp",), name="fp254.double")
def double(ctx, a: BigIntWires, *, fp: FieldParams) -> BigIntWires:
    """(2a) mod p via shift + conditional subtract (fp254impl.rs:170-189)."""
    assert len(a) == fp.n_bits
    shifted = a.clone()
    u = shifted.pop()
    shifted = BigIntWires([FALSE_WIRE] + shifted.bits)
    wires2 = bigint.add_constant(ctx, shifted, b=fp.not_modulus)
    wires2.pop()
    v = bigint.less_than_constant(ctx, shifted, b=fp.modulus)
    s = ctx.and_variant(u, v, (True, False, False))
    return bigint.select(ctx, shifted, wires2, s)


@component(offcircuit=("fp",), name="fp254.half")
def half(ctx, a: BigIntWires, *, fp: FieldParams) -> BigIntWires:
    """(a/2) mod p (fp254impl.rs:191-202)."""
    assert len(a) == fp.n_bits
    selector = a.get(0)
    wires1 = bigint.half(ctx, a)
    wires2 = bigint.add_constant_without_carry(ctx, wires1, fp.half_modulus)
    return bigint.select(ctx, wires2, wires1, selector)


def mul_montgomery(ctx, a: BigIntWires, b: BigIntWires, *, fp: FieldParams) -> BigIntWires:
    """(a*b*R^-1) mod p — bigint mul + Montgomery reduce (fp254impl.rs:216-233)."""
    assert len(a) == fp.n_bits and len(b) == fp.n_bits
    mul_result = bigint.mul(ctx, a, b)
    return montgomery_reduce(ctx, mul_result, fp=fp)


def square_montgomery(ctx, a: BigIntWires, *, fp: FieldParams) -> BigIntWires:
    return mul_montgomery(ctx, a, a, fp=fp)


@component(offcircuit=("b", "fp"), name="fp254.mul_by_constant_montgomery")
def _mul_by_constant_montgomery_baked(
    ctx, a: BigIntWires, *, b: int, fp: FieldParams
) -> BigIntWires:
    """Montgomery-form wire times standard-form constant (fp254impl.rs:252-271)."""
    assert len(a) == fp.n_bits
    b = b % fp.modulus
    if b == 0:
        return BigIntWires.new_constant(len(a), 0)
    if b == fp.to_mont(1):
        return a.clone()
    mul_res = bigint.mul_by_constant(ctx, a, c=b)
    return montgomery_reduce(ctx, mul_res, fp=fp)


@component(
    offcircuit=("b", "fp"), name="fp254.mul_by_constant_montgomery.u", barrier=True
)
def _mul_by_constant_montgomery_uniform(
    ctx, a: BigIntWires, *, b: int, fp: FieldParams
) -> BigIntWires:
    """Uniform-shape constant mul: the constant enters as FALSE/TRUE header
    wires through the generic Karatsuba multiplier, so every constant shares
    the same compiled tapes (signature/content collapse for the TPU executor;
    ``barrier`` keeps the constant wiring in step headers).  The gate stream
    differs from the reference's zero-bit-skipping schoolbook
    (fp254impl.rs:252-271) by ~+0.8%% total gates — parity mode keeps the
    baked variant."""
    const = BigIntWires.new_constant(fp.n_bits, b)
    mul_res = bigint.mul(ctx, a, const)
    return montgomery_reduce(ctx, mul_res, fp=fp)


def mul_by_constant_montgomery(
    ctx, a: BigIntWires, *, b: int, fp: FieldParams
) -> BigIntWires:
    """Dispatch on the trace-wide constant-gadget mode (TraceCtx.uniform_constants)."""
    if getattr(ctx, "uniform_constants", False):
        b = b % fp.modulus
        if b == 0:
            return BigIntWires.new_constant(fp.n_bits, 0)
        if b == fp.to_mont(1):
            return a.clone()
        return _mul_by_constant_montgomery_uniform(ctx, a, b=b, fp=fp)
    return _mul_by_constant_montgomery_baked(ctx, a, b=b, fp=fp)


@component(offcircuit=("fp",), name="fp254.montgomery_reduce")
def montgomery_reduce(ctx, x: BigIntWires, *, fp: FieldParams) -> BigIntWires:
    """REDC: 508-bit product -> 254-bit Montgomery form (fp254impl.rs:304-331)."""
    n = fp.n_bits
    assert len(x) == 2 * n
    x_low, x_high = x.clone().split_at(n)
    q = bigint.mul_by_constant_modulo_power_two(ctx, x_low, c=fp.m_inverse, power=n)
    sub_full = bigint.mul_by_constant(ctx, q, c=fp.modulus)
    sub_hi = BigIntWires(sub_full.bits[n : 2 * n])
    bound_check = bigint.greater_than(ctx, sub_hi, x_high)
    modulus_const = BigIntWires.new_constant(n, fp.modulus)
    subtract_if_too_much = bigint.self_or_zero(ctx, modulus_const, bound_check)
    new_sub = bigint.sub_without_borrow(ctx, sub_hi, subtract_if_too_much)
    return bigint.sub_without_borrow(ctx, x_high, new_sub)


# ----------------------------------------------------------------------
# Inverse (streaming extended Euclid, fp254impl.rs:333-680)
# ----------------------------------------------------------------------

_PER_CHUNK = 4


@component(offcircuit=("fp",), name="fp254.inverse_iteration")
def _inverse_iteration(
    ctx, u: BigIntWires, v: BigIntWires, r: BigIntWires, s: BigIntWires, k: BigIntWires, *, fp
):
    """4 iterations of the binary extended-Euclid step (fp254impl.rs:420-545)."""
    for _ in range(_PER_CHUNK):
        not_x1 = u.get(0)
        not_x2 = v.get(0)
        x3 = bigint.greater_than(ctx, u, v)
        p2 = ctx.and_variant(not_x1, not_x2, (False, True, False))
        wires_2 = ctx.and_(not_x1, not_x2)
        p3 = ctx.and_(wires_2, x3)
        p4 = ctx.nimp(wires_2, x3)

        u1 = bigint.half(ctx, u)
        v1 = v.clone()
        r1 = r.clone()
        s1 = bigint.double_without_overflow(ctx, s)
        k1 = bigint.add_constant_without_carry(ctx, k, 1)

        u2 = u.clone()
        v2 = bigint.half(ctx, v)
        r2 = bigint.double_without_overflow(ctx, r)
        s2 = s.clone()
        k2 = bigint.add_constant_without_carry(ctx, k, 1)

        u3 = bigint.sub_without_borrow(ctx, u1, v2)
        v3 = v.clone()
        r3 = bigint.add_without_carry(ctx, r, s)
        s3 = bigint.double_without_overflow(ctx, s)
        k3 = bigint.add_constant_without_carry(ctx, k, 1)

        u4 = u.clone()
        v4 = bigint.sub_without_borrow(ctx, v2, u1)
        r4 = bigint.double_without_overflow(ctx, r)
        s4 = bigint.add_without_carry(ctx, r, s)
        k4 = bigint.add_constant_without_carry(ctx, k, 1)

        def blend(w1, w2, w3, w4):
            m1 = bigint.self_or_zero_inv(ctx, w1, not_x1)
            m2 = bigint.self_or_zero(ctx, w2, p2)
            m3 = bigint.self_or_zero(ctx, w3, p3)
            m4 = bigint.self_or_zero(ctx, w4, p4)
            a1 = bigint.add_without_carry(ctx, m1, m2)
            a2 = bigint.add_without_carry(ctx, a1, m3)
            return bigint.add_without_carry(ctx, a2, m4)

        new_u = blend(u1, u2, u3, u4)
        new_v = blend(v1, v2, v3, v4)
        new_r = blend(r1, r2, r3, r4)
        new_s = blend(s1, s2, s3, s4)
        new_k = blend(k1, k2, k3, k4)

        v_equals_one = bigint.equal_constant(ctx, v, b=1)
        u = bigint.select(ctx, u, new_u, v_equals_one)
        v = bigint.select(ctx, v, new_v, v_equals_one)
        r = bigint.select(ctx, r, new_r, v_equals_one)
        s = bigint.select(ctx, s, new_s, v_equals_one)
        k = bigint.select(ctx, k, new_k, v_equals_one)
    return u, v, r, s, k


@component(offcircuit=("chunk_len", "fp"), name="fp254.inverse_div_even_chunk")
def _div_even_chunk(
    ctx, s: BigIntWires, even_part: BigIntWires, *, chunk_len: int, fp
):
    # NOTE: the reference keys these chunks by chunk_idx
    # (fp254impl.rs:565-575) even though all full chunks are identical; we key
    # by chunk length only — the emitted gate stream is the same, but 63
    # redundant template traces/compiles are avoided.
    for _ in range(chunk_len):
        updated_s = half(ctx, s, fp=fp)
        updated_even = half(ctx, even_part, fp=fp)
        selector = bigint.equal_constant(ctx, even_part, b=1)
        s = bigint.select(ctx, s, updated_s, selector)
        even_part = bigint.select(ctx, even_part, updated_even, selector)
    return s, even_part


@component(offcircuit=("fp",), name="fp254.inverse_div_even")
def _div_even(ctx, s: BigIntWires, even_part: BigIntWires, *, fp):
    n = fp.n_bits
    for start in range(0, n, _PER_CHUNK):
        chunk_len = min(_PER_CHUNK, n - start)
        s, even_part = _div_even_chunk(ctx, s, even_part, chunk_len=chunk_len, fp=fp)
    return s


@component(offcircuit=("fp",), name="fp254.inverse_div_2k_chunk")
def _div_2k_chunk(ctx, s: BigIntWires, k: BigIntWires, *, fp):
    for _ in range(_PER_CHUNK):
        updated_s = half(ctx, s, fp=fp)
        updated_k = add_constant(ctx, k, b=fp.modulus - 1, fp=fp)
        selector = equal_constant(ctx, k, 0, fp=fp)
        s = bigint.select(ctx, s, updated_s, selector)
        k = bigint.select(ctx, k, updated_k, selector)
    return s, k


@component(offcircuit=("fp",), name="fp254.inverse_div_2k")
def _div_2k(ctx, s: BigIntWires, k: BigIntWires, *, fp):
    for _ in range(0, 2 * fp.n_bits, _PER_CHUNK):
        s, k = _div_2k_chunk(ctx, s, k, fp=fp)
    return s


@component(offcircuit=("fp",), name="fp254.inverse")
def inverse(ctx, a: BigIntWires, *, fp: FieldParams) -> BigIntWires:
    """Streaming binary extended Euclid (standard form), fp254impl.rs:333-680."""
    assert len(a) == fp.n_bits
    odd_part, even_part = bigint.odd_part(ctx, a)

    neg_odd = neg(ctx, odd_part, fp=fp)
    u = bigint.half(ctx, neg_odd)
    v = odd_part
    k = BigIntWires.new_constant(len(a), 1)
    r = BigIntWires.new_constant(len(a), 1)
    s = BigIntWires.new_constant(len(a), 2)

    for _ in range(0, 2 * fp.n_bits, _PER_CHUNK):
        u, v, r, s, k = _inverse_iteration(ctx, u, v, r, s, k, fp=fp)

    s = _div_even(ctx, s, even_part, fp=fp)
    return _div_2k(ctx, s, k, fp=fp)


def inverse_montgomery(ctx, a: BigIntWires, *, fp: FieldParams) -> BigIntWires:
    """Inverse in Montgomery form: inverse then scale by R^3 (fp254impl.rs:680-691)."""
    b = inverse(ctx, a, fp=fp)
    r_cubed = pow(fp.mont_r, 3, fp.modulus)
    return mul_by_constant_montgomery(ctx, b, b=r_cubed, fp=fp)


@component(offcircuit=("exp", "fp"), name="fp254.exp_by_constant_montgomery")
def exp_by_constant_montgomery(
    ctx, a: BigIntWires, *, exp: int, fp: FieldParams
) -> BigIntWires:
    """Square-and-multiply by a host constant (fp254impl.rs:693-726)."""
    if exp == 0:
        return BigIntWires.new_constant(len(a), 1)
    if exp == 1:
        return a.clone()
    nbits = exp.bit_length()
    result = a.clone()
    for i in range(nbits - 2, -1, -1):
        result_square = square_montgomery(ctx, result, fp=fp)
        if (exp >> i) & 1:
            result = mul_montgomery(ctx, a, result_square, fp=fp)
        else:
            result = result_square
    return result


@component(offcircuit=("fp",), name="fp254.triple")
def triple(ctx, a: BigIntWires, *, fp: FieldParams) -> BigIntWires:
    a_2 = double(ctx, a, fp=fp)
    return add(ctx, a_2, a, fp=fp)


@component(offcircuit=("fp",), name="fp254.div6")
def div6(ctx, a: BigIntWires, *, fp: FieldParams) -> BigIntWires:
    """(a/6) mod p: bit-serial division by 3 of a/2 (fp254impl.rs:728-793)."""
    assert len(a) == fp.n_bits
    h = half(ctx, a, fp=fp)
    result: list[int | None] = [None] * fp.n_bits
    r1 = FALSE_WIRE
    r2 = FALSE_WIRE
    for i in range(fp.n_bits):
        j = fp.n_bits - 1 - i
        r2_and_hj = ctx.and_(r2, h.get(j))
        result_wire = ctx.or_(r1, r2_and_hj)
        result[j] = result_wire
        r1 = ctx.xor(r2, result_wire)
        r2 = ctx.xor(h.get(j), result_wire)
        edge_case = ctx.nimp(result_wire, h.get(j))
        r1 = ctx.xor(r1, edge_case)
    result_bn = BigIntWires(result)
    plus_one_third = bigint.add_constant_without_carry(
        ctx, result_bn, fp.one_third_modulus
    )
    result_bn = bigint.select(ctx, plus_one_third, result_bn, r2)
    plus_two_third = bigint.add_constant_without_carry(
        ctx, result_bn, fp.two_third_modulus
    )
    return bigint.select(ctx, plus_two_third, result_bn, r1)


def multiplexer(ctx, a: list[BigIntWires], s: list[int], w: int) -> BigIntWires:
    return bigint.multiplexer(ctx, a, s, w=w)


def sqrt_montgomery(ctx, a: BigIntWires, *, fp: FieldParams) -> BigIntWires:
    """x^((p+1)/4) (fq.rs:291-299; valid for p ≡ 3 mod 4)."""
    return exp_by_constant_montgomery(ctx, a, exp=fp.modulus_add_1_div_4, fp=fp)


def is_qnr_montgomery(ctx, x: BigIntWires, *, fp: FieldParams) -> int:
    """1 iff x is a quadratic non-residue (fq.rs:177-193)."""
    y = exp_by_constant_montgomery(ctx, x, exp=(fp.modulus - 1) // 2, fp=fp)
    neg_one_mont = BigIntWires.new_constant(fp.n_bits, fp.to_mont(fp.modulus - 1))
    return bigint.equal(ctx, y, neg_one_mont)
