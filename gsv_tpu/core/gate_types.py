"""Gate types, half-gates alpha parameters, gate-count histogram.

Reference parity: ``src/core/gate_type.rs`` — the 11-member gate enum with the
same integer encoding, the constant alpha-parameter table used by half-gates
garbling (``alphas_const``, gate_type.rs:20-37), truth-table derivation
(gate_type.rs:84-118) and the ``GateCount`` rollups (gate_type.rs:123-153).

The numeric values are load-bearing: gate tapes store the gate type as a
uint8 using exactly this encoding, and the alpha tables below are indexed by
it inside the garbling kernels.
"""

from __future__ import annotations

from enum import IntEnum

import numpy as np


class GateType(IntEnum):
    AND = 0
    NAND = 1
    NIMP = 2   # a & !b
    IMP = 3    # a => b
    NCIMP = 4  # !a & b
    CIMP = 5   # b => a
    NOR = 6
    OR = 7
    XOR = 8
    XNOR = 9
    NOT = 10


N_GATE_TYPES = 11

def gate_fn(gt: int):
    """Boolean function of the gate, matching ``GateType::f`` (gate_type.rs:41-61)."""
    g = GateType(gt)
    return lambda a, b: execute_gate(g, a, b)


def execute_gate(gt: int, a: bool, b: bool) -> bool:
    """Evaluate a single gate on Python bools."""
    g = GateType(gt)
    if g == GateType.AND:
        return a and b
    if g == GateType.NAND:
        return not (a and b)
    if g == GateType.NIMP:
        return a and not b
    if g == GateType.IMP:
        return (not a) or b
    if g == GateType.NCIMP:
        return (not a) and b
    if g == GateType.CIMP:
        return (not b) or a
    if g == GateType.NOR:
        return not (a or b)
    if g == GateType.OR:
        return a or b
    if g == GateType.XOR:
        return a != b
    if g == GateType.XNOR:
        return a == b
    if g == GateType.NOT:
        return not a
    raise ValueError(gt)


def truth_table(gt: int) -> int:
    """4-bit truth table: bit0=f(0,0), bit1=f(0,1), bit2=f(1,0), bit3=f(1,1)."""
    tt = 0
    for idx, (a, b) in enumerate([(False, False), (False, True), (True, False), (True, True)]):
        if execute_gate(gt, a, b):
            tt |= 1 << idx
    return tt


def alphas(gt: int) -> tuple[bool, bool, bool]:
    """Half-gates alpha parameters derived from the truth table.

    For odd-parity gates: f(a, b) == ((a ^ alpha_a) & (b ^ alpha_b)) ^ alpha_c.
    Matches ``GateType::alphas`` (gate_type.rs:102-118).
    """
    tt = truth_table(gt)
    assert bin(tt).count("1") % 2 == 1, "truth table must have odd parity"
    f00 = bool(tt & 1)
    f01 = bool((tt >> 1) & 1)
    f10 = bool((tt >> 2) & 1)
    alpha_a = f01 ^ f00
    alpha_b = f10 ^ f00
    alpha_c = f00 ^ (alpha_a & alpha_b)
    return (alpha_a, alpha_b, alpha_c)


def is_free(gt: int) -> bool:
    return gt in (GateType.XOR, GateType.XNOR, GateType.NOT)


AND_VARIANTS = tuple(GateType(i) for i in range(8))

# Constant alpha tables indexed by gate type (values for free gates unused;
# zeros as placeholders, matching ``alphas_const`` in the reference).
ALPHA_A = np.zeros(N_GATE_TYPES, dtype=np.uint8)
ALPHA_B = np.zeros(N_GATE_TYPES, dtype=np.uint8)
ALPHA_C = np.zeros(N_GATE_TYPES, dtype=np.uint8)
for _gt in AND_VARIANTS:
    _aa, _ab, _ac = alphas(_gt)
    ALPHA_A[_gt] = _aa
    ALPHA_B[_gt] = _ab
    ALPHA_C[_gt] = _ac

# 1 where the gate type is free (XOR / XNOR / NOT).
FREE_MASK = np.zeros(N_GATE_TYPES, dtype=np.uint8)
for _gt in (GateType.XOR, GateType.XNOR, GateType.NOT):
    FREE_MASK[_gt] = 1

# Truth tables packed per type (used by vectorized execute mode: the output
# bit is ``(tt >> (a * 2 + b)) & 1`` — note reference's bit order has index
# ``a << 1 | b``).
TRUTH_TABLE = np.zeros(N_GATE_TYPES, dtype=np.uint8)
for _gt in range(N_GATE_TYPES):
    _tt = 0
    for _a in (0, 1):
        for _b in (0, 1):
            if execute_gate(_gt, bool(_a), bool(_b)):
                _tt |= 1 << (_a * 2 + _b)
    TRUTH_TABLE[_gt] = _tt


def and_variant(f0: bool, f1: bool, f2: bool) -> GateType:
    """Map the 3-bit encoding ``((a^f0)&(b^f1))^f2`` to its gate type.

    Matches ``Gate::and_variant`` (src/core/gate.rs:180-196).
    """
    return GateType((int(f0) << 2) | (int(f1) << 1) | int(f2))


class GateCount:
    """Per-type gate histogram with rollups (``GateCount``, gate_type.rs:123-153)."""

    __slots__ = ("counts",)

    def __init__(self, counts=None):
        self.counts = np.zeros(N_GATE_TYPES, dtype=np.uint64) if counts is None else np.asarray(counts, dtype=np.uint64).copy()

    def handle(self, gt: int, n: int = 1) -> None:
        self.counts[gt] += np.uint64(n)

    def add(self, other: "GateCount", times: int = 1) -> None:
        self.counts += other.counts * np.uint64(times)

    @property
    def total(self) -> int:
        return int(self.counts.sum())

    @property
    def nonfree(self) -> int:
        return int(self.counts[:8].sum())

    @property
    def free(self) -> int:
        return self.total - self.nonfree

    @property
    def xor_variants(self) -> int:
        return int(self.counts[GateType.XOR] + self.counts[GateType.XNOR])

    def __eq__(self, other):
        return isinstance(other, GateCount) and bool(np.array_equal(self.counts, other.counts))

    def __repr__(self):
        return (
            f"GateCount(total={self.total:,}, nonfree={self.nonfree:,}, "
            f"free={self.free:,})"
        )

    def as_dict(self) -> dict:
        return {
            "per_type": {GateType(i).name: int(self.counts[i]) for i in range(N_GATE_TYPES)},
            "total": self.total,
            "nonfree": self.nonfree,
            "free": self.free,
        }
