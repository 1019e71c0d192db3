"""Basic cells: adders, subtracters, selector, multiplexer.

Reference parity: ``src/gadgets/basic.rs`` (gate-for-gate, same emission
order).  Only ``multiplexer`` is a cached component; the rest emit inline,
exactly like the reference.
"""

from __future__ import annotations

from gsv_tpu.core.gate_types import GateType
from gsv_tpu.circuit.builder import TraceCtx, component


def not_gate(ctx: TraceCtx, a: int) -> int:
    """``Gate::not_with_xor``: free NOT as XOR with the TRUE constant."""
    return ctx.gate(GateType.XOR, a, ctx.TRUE)


def half_adder(ctx: TraceCtx, a: int, b: int) -> tuple[int, int]:
    """(sum, carry) — basic.rs:7-16."""
    result = ctx.xor(a, b)
    carry = ctx.and_(a, b)
    return result, carry


def full_adder(ctx: TraceCtx, a: int, b: int, c: int) -> tuple[int, int]:
    """(sum, carry) — basic.rs:17-32."""
    axc = ctx.xor(a, c)
    bxc = ctx.xor(b, c)
    result = ctx.xor(a, bxc)
    t = ctx.and_(axc, bxc)
    carry = ctx.xor(c, t)
    return result, carry


def half_subtracter(ctx: TraceCtx, a: int, b: int) -> tuple[int, int]:
    """(diff, borrow) — basic.rs:34-45; borrow = !a & b (NCIMP)."""
    result = ctx.xor(a, b)
    borrow = ctx.and_variant(a, b, (True, False, False))
    return result, borrow


def full_subtracter(ctx: TraceCtx, a: int, b: int, c: int) -> tuple[int, int]:
    """(diff, borrow) — basic.rs:47-63."""
    bxa = ctx.xor(a, b)
    bxc = ctx.xor(b, c)
    result = ctx.xor(bxa, c)
    t = ctx.and_(bxa, bxc)
    carry = ctx.xor(c, t)
    return result, carry


def selector(ctx: TraceCtx, a: int, b: int, c: int) -> int:
    """3-gate mux: c ? a : b — basic.rs:65-71."""
    d = ctx.nand(a, c)
    f = ctx.and_variant(c, b, (True, False, True))  # CIMP: c | !b
    g = ctx.nand(d, f)
    return g


@component(offcircuit=("w",), name="basic.multiplexer")
def multiplexer(ctx: TraceCtx, a: list[int], s: list[int], *, w: int) -> int:
    """Log-depth mux over 2**w inputs, selector bits LSB-first — basic.rs:73-105."""
    n = 1 << w
    assert len(a) == n, (len(a), n)
    assert len(s) == w
    cur = list(a)
    for sel in s:
        nxt = []
        for i in range(0, len(cur), 2):
            low, high = cur[i], cur[i + 1]
            nxt.append(selector(ctx, high, low, sel))
        cur = nxt
    assert len(cur) == 1
    return cur[0]
