"""Big-integer (little-endian bit vector) arithmetic gadgets.

Reference parity: ``src/gadgets/bigint/`` (mod.rs, add.rs, mul.rs, cmp.rs) —
same algorithms, same gate emission order: ripple adders/subtracters,
Karatsuba multiplication with the reference's exact crossover
(``is_use_karatsuba``: len > 19 except 21, mul.rs:8-13), constant
multiplication, comparison chains and selector trees.
"""

from __future__ import annotations

from gsv_tpu.core.gate_types import GateType
from gsv_tpu.circuit.builder import FALSE_WIRE, TraceCtx, component
from gsv_tpu.circuit.wires import WireStruct
from gsv_tpu.gadgets import basic


def bits_from_int(u: int, bit_count: int) -> list[bool]:
    """LE bit list; errors if the value doesn't fit (bigint/mod.rs:33-48)."""
    if u < 0:
        raise ValueError("negative bigint")
    if u.bit_length() > bit_count:
        raise ValueError(
            f"BigUint overflow: value requires {u.bit_length()} bits, limit {bit_count}"
        )
    return [bool((u >> i) & 1) for i in range(bit_count)]


def int_from_bits(bits: list[bool]) -> int:
    v = 0
    for i, b in enumerate(bits):
        if b:
            v |= 1 << i
    return v


class BigIntWires(WireStruct):
    """LE bit-vector of wires (``BigIntWires``, bigint/mod.rs:51-185)."""

    __slots__ = ("bits",)

    def __init__(self, bits: list[int]):
        self.bits = list(bits)

    # -- construction --------------------------------------------------

    @classmethod
    def from_ctx(cls, ctx: TraceCtx, length: int) -> "BigIntWires":
        return cls([ctx.issue_wire() for _ in range(length)])

    @classmethod
    def new_constant(cls, length: int, u: int) -> "BigIntWires":
        bits = bits_from_int(u, length)
        return cls([1 if b else 0 for b in bits])  # TRUE_WIRE=1 / FALSE_WIRE=0

    # -- wire-structure protocol --------------------------------------

    def wires_flatten(self):
        return list(self.bits), len(self.bits)

    @classmethod
    def wires_unflatten(cls, aux, children):
        return cls(children)

    # -- conveniences --------------------------------------------------

    def __len__(self):
        return len(self.bits)

    def __getitem__(self, i):
        return self.bits[i]

    def get(self, i: int) -> int:
        return self.bits[i]

    def last(self) -> int:
        return self.bits[-1]

    def pop(self) -> int:
        return self.bits.pop()

    def clone(self) -> "BigIntWires":
        return BigIntWires(self.bits)

    def split_at(self, k: int) -> tuple["BigIntWires", "BigIntWires"]:
        return BigIntWires(self.bits[:k]), BigIntWires(self.bits[k:])

    def __repr__(self):
        return f"BigIntWires(len={len(self.bits)})"


# ----------------------------------------------------------------------
# add.rs
# ----------------------------------------------------------------------


@component(name="bigint.add")
def add(ctx, a: BigIntWires, b: BigIntWires) -> BigIntWires:
    """Ripple add -> len+1 bits (add.rs:8-26)."""
    assert len(a) == len(b)
    bits = []
    result, carry = basic.half_adder(ctx, a.get(0), b.get(0))
    bits.append(result)
    for i in range(1, len(a)):
        result, carry = basic.full_adder(ctx, a.get(i), b.get(i), carry)
        bits.append(result)
    bits.append(carry)
    return BigIntWires(bits)


def add_without_carry(ctx, a: BigIntWires, b: BigIntWires) -> BigIntWires:
    c = add(ctx, a, b)
    c = BigIntWires(c.bits[:-1])
    return c


@component(offcircuit=("b",), name="bigint.add_constant")
def add_constant(ctx, a: BigIntWires, *, b: int) -> BigIntWires:
    """a + constant -> len+1 bits (add.rs:38-84)."""
    assert b != 0
    b_bits = bits_from_int(b, len(a))
    first_one = 0
    while not b_bits[first_one]:
        first_one += 1

    bits = []
    carry = None
    for i in range(len(a)):
        a_i = a.get(i)
        if i < first_one:
            bits.append(a_i)
        elif i == first_one:
            bits.append(basic.not_gate(ctx, a_i))
            carry = a_i
        elif b_bits[i]:
            bits.append(ctx.xnor(a_i, carry))
            carry = ctx.or_(a_i, carry)
        else:
            bits.append(ctx.xor(a_i, carry))
            carry = ctx.and_(a_i, carry)
    bits.append(carry)
    return BigIntWires(bits)


def add_constant_without_carry(ctx, a: BigIntWires, b: int) -> BigIntWires:
    c = add_constant(ctx, a, b=b)
    return BigIntWires(c.bits[:-1])


@component(name="bigint.sub")
def sub(ctx, a: BigIntWires, b: BigIntWires) -> BigIntWires:
    """Ripple subtract -> len+1 bits, last = borrow (add.rs:95-115)."""
    assert len(a) == len(b)
    bits = []
    result, borrow = basic.half_subtracter(ctx, a.get(0), b.get(0))
    bits.append(result)
    for i in range(1, len(a)):
        result, borrow = basic.full_subtracter(ctx, a.get(i), b.get(i), borrow)
        bits.append(result)
    bits.append(borrow)
    return BigIntWires(bits)


@component(name="bigint.sub_without_borrow")
def sub_without_borrow(ctx, a: BigIntWires, b: BigIntWires) -> BigIntWires:
    c = sub(ctx, a, b)
    return BigIntWires(c.bits[:-1])


@component(name="bigint.double")
def double(ctx, a: BigIntWires) -> BigIntWires:
    return BigIntWires([FALSE_WIRE] + a.bits)


@component(name="bigint.double_without_overflow")
def double_without_overflow(ctx, a: BigIntWires) -> BigIntWires:
    return BigIntWires([FALSE_WIRE] + a.bits[:-1])


def half(ctx, a: BigIntWires) -> BigIntWires:
    return BigIntWires(a.bits[1:] + [FALSE_WIRE])


def odd_part(ctx, a: BigIntWires) -> tuple[BigIntWires, BigIntWires]:
    """(odd part, 2^k marker) via prefix-OR masking (add.rs:149-185)."""
    select_bits = [a.get(0)]
    for i in range(1, len(a)):
        select_bits.append(ctx.or_(select_bits[i - 1], a.get(i)))
    select_bn = BigIntWires(select_bits)

    k_bits = [a.get(0)]
    for i in range(1, len(a)):
        k_bits.append(
            ctx.and_variant(select_bn.get(i - 1), a.get(i), (True, False, False))
        )
    k = BigIntWires(k_bits)

    odd_acc = a.clone()
    for i in range(len(a)):
        half_res = half(ctx, odd_acc)
        odd_acc = select(ctx, odd_acc, half_res, select_bn.get(i))
    return odd_acc, k


# ----------------------------------------------------------------------
# mul.rs
# ----------------------------------------------------------------------


def is_use_karatsuba(length: int) -> bool:
    """Pre-computed crossover (mul.rs:8-13)."""
    if length == 21:
        return False
    return length > 19


@component(name="bigint.mul_naive")
def mul_naive(ctx, a: BigIntWires, b: BigIntWires) -> BigIntWires:
    """Shift-and-add -> 2*len bits (mul.rs:19-55)."""
    assert len(a) == len(b)
    length = len(a)
    result_bits = [FALSE_WIRE] * (length * 2)
    for i in range(length):
        current_bit = b.get(i)
        addition_0 = result_bits[i : i + length]
        addition_1 = [ctx.and_(a_bit, current_bit) for a_bit in a.bits]
        s = add(ctx, BigIntWires(addition_0), BigIntWires(addition_1))
        result_bits[i : i + length + 1] = s.bits
    return BigIntWires(result_bits)


@component(name="bigint.mul_karatsuba")
def mul_karatsuba(ctx, a: BigIntWires, b: BigIntWires) -> BigIntWires:
    """Recursive Karatsuba -> 2*len bits (mul.rs:57-185)."""
    assert len(a) == len(b)
    length = len(a)
    if length < 5:
        return mul_naive(ctx, a, b)

    result_bits = [FALSE_WIRE] * (length * 2)
    len_0 = length // 2
    len_1 = (length + 1) // 2

    a_0, a_1 = a.clone().split_at(len_0)
    b_0, b_1 = b.clone().split_at(len_0)

    sq_0 = (mul_karatsuba if is_use_karatsuba(len_0) else mul_naive)(ctx, a_0, b_0)
    sq_1 = (mul_karatsuba if is_use_karatsuba(len_1) else mul_naive)(ctx, a_1, b_1)

    extended_a_0 = list(a_0.bits)
    extended_b_0 = list(b_0.bits)
    extended_sq_0 = list(sq_0.bits)
    if len_0 < len_1:
        extended_a_0.append(FALSE_WIRE)
        extended_b_0.append(FALSE_WIRE)
        extended_sq_0.append(FALSE_WIRE)
        extended_sq_0.append(FALSE_WIRE)

    sum_a = add(ctx, BigIntWires(extended_a_0), a_1)
    sum_b = add(ctx, BigIntWires(extended_b_0), b_1)
    sq_sum = add(ctx, BigIntWires(extended_sq_0), sq_1)
    sq_sum_bits = sq_sum.bits + [FALSE_WIRE]

    sum_mul = (mul_karatsuba if is_use_karatsuba(len(sum_a)) else mul_naive)(
        ctx, sum_a, sum_b
    )

    cross_term_full = sub_without_borrow(ctx, sum_mul, BigIntWires(sq_sum_bits))
    cross_term = BigIntWires(cross_term_full.bits[: length + 1])

    result_bits[: len_0 * 2] = sq_0.bits

    segment = BigIntWires(result_bits[len_0 : len_0 + length + 1])
    new_segment = add(ctx, segment, cross_term)
    result_bits[len_0 : len_0 + length + 2] = new_segment.bits

    segment2 = BigIntWires(result_bits[2 * len_0 :])
    new_segment2 = add(ctx, segment2, sq_1)
    result_bits[2 * len_0 :] = new_segment2.bits[: 2 * len_1]

    return BigIntWires(result_bits)


def mul(ctx, a: BigIntWires, b: BigIntWires) -> BigIntWires:
    """Dispatcher (mul.rs:187-208)."""
    assert len(a) == len(b)
    length = len(a)
    if length < 5:
        return mul_naive(ctx, a, b)
    assert length <= 4000
    if is_use_karatsuba(length):
        return mul_karatsuba(ctx, a, b)
    return mul_naive(ctx, a, b)


@component(offcircuit=("c",), name="bigint.mul_by_constant")
def mul_by_constant(ctx, a: BigIntWires, *, c: int) -> BigIntWires:
    """a * constant -> 2*len bits (mul.rs:210-240)."""
    length = len(a)
    acc = [FALSE_WIRE] * (length * 2)
    for i, bit in enumerate(bits_from_int(c, length)):
        if not bit:
            continue
        addition = BigIntWires(acc[i : i + length])
        new_bits = add(ctx, a, addition)
        acc[i : i + length + 1] = new_bits.bits
    return BigIntWires(acc)


@component(offcircuit=("c", "power"), name="bigint.mul_by_constant_modulo_power_two")
def mul_by_constant_modulo_power_two(
    ctx, a: BigIntWires, *, c: int, power: int
) -> BigIntWires:
    """(a * c) mod 2^power, chunked 8 one-bits per child (mul.rs:242-328).

    NOTE: the reference keys the inner chunk component by (a_len, power,
    chunk_idx) only — not the constant (mul.rs:281-289); we additionally fold
    the chunk's bit indices into the key for correctness with multiple
    constants of the same shape.
    """
    PER_CHUNK = 8
    length = len(a)
    assert power < 2 * length
    ones = [i for i, bit in enumerate(bits_from_int(c, length)) if bit and i < power]
    result_bits = [FALSE_WIRE] * power
    if not ones:
        return BigIntWires(result_bits)

    for chunk_idx in range(0, len(ones), PER_CHUNK):
        chunk = tuple(ones[chunk_idx : chunk_idx + PER_CHUNK])
        result_bits = _mul_const_mod_2p_chunk(
            ctx, a, BigIntWires(result_bits), chunk=chunk, power=power
        ).bits
    return BigIntWires(result_bits)


@component(offcircuit=("chunk", "power"), name="bigint.mul_by_const_mod_2p_chunk")
def _mul_const_mod_2p_chunk(
    ctx, a: BigIntWires, res: BigIntWires, *, chunk: tuple, power: int
) -> BigIntWires:
    length = len(a)
    bits = list(res.bits)
    for i in chunk:
        number_of_bits = min(power - i, length)
        if number_of_bits == 0:
            continue
        a_slice = BigIntWires(a.bits[:number_of_bits])
        addition = BigIntWires(bits[i : i + number_of_bits])
        new_bits = add(ctx, a_slice, addition)
        if i + number_of_bits < power:
            bits[i : i + number_of_bits + 1] = new_bits.bits
        else:
            bits[i : i + number_of_bits] = new_bits.bits[:number_of_bits]
    return BigIntWires(bits)


# ----------------------------------------------------------------------
# cmp.rs
# ----------------------------------------------------------------------


@component(name="bigint.self_or_zero")
def self_or_zero(ctx, a: BigIntWires, s: int) -> BigIntWires:
    return BigIntWires([ctx.and_(a_i, s) for a_i in a.bits])


@component(name="bigint.self_or_zero_inv")
def self_or_zero_inv(ctx, a: BigIntWires, s: int) -> BigIntWires:
    """a if !s else 0 (NIMP per bit, cmp.rs:24-40)."""
    return BigIntWires(
        [ctx.and_variant(a_i, s, (False, True, False)) for a_i in a.bits]
    )


@component(name="bigint.equal")
def equal(ctx, a: BigIntWires, b: BigIntWires) -> int:
    assert len(a) == len(b)
    xor_bits = [ctx.xor(a_i, b_i) for a_i, b_i in zip(a.bits, b.bits)]
    return equal_constant(ctx, BigIntWires(xor_bits), b=0)


@component(offcircuit=("b",), name="bigint.equal_constant")
def equal_constant(ctx, a: BigIntWires, *, b: int) -> int:
    if b == 0:
        return equal_zero(ctx, a)
    b_bits = bits_from_int(b, len(a))
    one_ind = b_bits.index(True)
    res = a.get(one_ind)
    for i, a_i in enumerate(a.bits):
        if i == one_ind:
            continue
        res = ctx.and_variant(a_i, res, (not b_bits[i], False, False))
    return res


@component(name="bigint.equal_zero")
def equal_zero(ctx, a: BigIntWires) -> int:
    if len(a) == 1:
        return basic.not_gate(ctx, a.get(0))
    res = ctx.xnor(a.get(0), a.get(1))
    for a_i in a.bits[1:]:
        res = ctx.and_variant(a_i, res, (True, False, False))
    return res


@component(name="bigint.greater_than")
def greater_than(ctx, a: BigIntWires, b: BigIntWires) -> int:
    not_b = BigIntWires([basic.not_gate(ctx, b_i) for b_i in b.bits])
    s = add(ctx, a, not_b)
    return s.last()


@component(offcircuit=("b",), name="bigint.less_than_constant")
def less_than_constant(ctx, a: BigIntWires, *, b: int) -> int:
    not_a = BigIntWires([basic.not_gate(ctx, a_i) for a_i in a.bits])
    s = add_constant(ctx, not_a, b=b)
    return s.last()


@component(name="bigint.select")
def select(ctx, a: BigIntWires, b: BigIntWires, s: int) -> BigIntWires:
    """Bitwise s ? a : b (cmp.rs:154-171)."""
    assert len(a) == len(b)
    return BigIntWires(
        [basic.selector(ctx, a_i, b_i, s) for a_i, b_i in zip(a.bits, b.bits)]
    )


@component(offcircuit=("w",), name="bigint.multiplexer")
def multiplexer(ctx, a: list[BigIntWires], s: list[int], *, w: int) -> BigIntWires:
    """n-way mux over equal-length bigints (cmp.rs:173-207)."""
    n = 1 << w
    assert len(a) == n
    n_bits = len(a[0])
    assert all(len(a_i) == n_bits for a_i in a)
    bits = []
    for i in range(n_bits):
        ith = [a_i.get(i) for a_i in a]
        bits.append(basic.multiplexer(ctx, ith, s, w=w))
    return BigIntWires(bits)
