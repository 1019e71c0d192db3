"""Host<->wire encoding helpers for the BN254 gadget stack.

The circuit works on little-endian bit lists of 254-bit Montgomery-form
limbs (fp254impl.rs conventions); the host oracle (gsv_tpu.bn254_host)
works on standard-form ints.  These helpers convert between the two for
tests and validation drivers (shared by tests/test_tower.py and
scripts/validate_stages.py).
"""

from __future__ import annotations

from gsv_tpu.bn254_host.field import Fq as HFq, Fq2 as HFq2, Fq6 as HFq6, Fq12 as HFq12
from gsv_tpu.gadgets.bigint import BigIntWires
from gsv_tpu.gadgets.bn254.fp254 import FQ_PARAMS as FP
from gsv_tpu.gadgets.bn254.fq import FqWire
from gsv_tpu.gadgets.bn254.fq2 import Fq2Wire
from gsv_tpu.gadgets.bn254.fq6 import Fq6Wire
from gsv_tpu.gadgets.bn254.fq12 import Fq12Wire
from gsv_tpu.gadgets.bn254.g1 import G1Wire
from gsv_tpu.gadgets.bn254.g2 import G2Wire

N = 254


def enc_fq(v: int) -> list[bool]:
    """Host int -> Montgomery little-endian bits."""
    m = FP.to_mont(int(v))
    return [bool((m >> i) & 1) for i in range(N)]


def dec_fq(bits) -> int:
    m = 0
    for i, b in enumerate(bits):
        m |= int(b) << i
    return FP.from_mont(m)


def enc_fq2(v: HFq2) -> list[bool]:
    return enc_fq(int(v.c0)) + enc_fq(int(v.c1))


def enc_fq6(v: HFq6) -> list[bool]:
    return enc_fq2(v.c0) + enc_fq2(v.c1) + enc_fq2(v.c2)


def enc_fq12(v: HFq12) -> list[bool]:
    return enc_fq6(v.c0) + enc_fq6(v.c1)


def dec_many_fq(bits, n: int) -> list[int]:
    return [dec_fq(bits[i * N : (i + 1) * N]) for i in range(n)]


def dec_fq2(bits) -> HFq2:
    a = dec_many_fq(bits, 2)
    return HFq2(HFq(a[0]), HFq(a[1]))


def dec_fq6(bits) -> HFq6:
    return HFq6(dec_fq2(bits[: 2 * N]), dec_fq2(bits[2 * N : 4 * N]), dec_fq2(bits[4 * N :]))


def dec_fq12(bits) -> HFq12:
    return HFq12(dec_fq6(bits[: 6 * N]), dec_fq6(bits[6 * N : 12 * N]))


# ---- wire constructors over a flat input-id list ------------------------

def wire_fq(ins, k: int) -> FqWire:
    return FqWire(BigIntWires(ins[k * N : (k + 1) * N]))


def wire_fq2(ins, k: int) -> Fq2Wire:
    return Fq2Wire(wire_fq(ins, k), wire_fq(ins, k + 1))


def wire_fq6(ins, k: int) -> Fq6Wire:
    return Fq6Wire(wire_fq2(ins, k), wire_fq2(ins, k + 2), wire_fq2(ins, k + 4))


def wire_fq12(ins, k: int) -> Fq12Wire:
    return Fq12Wire(wire_fq6(ins, k), wire_fq6(ins, k + 6))


def wire_g1(ins, k: int) -> G1Wire:
    return G1Wire(wire_fq(ins, k), wire_fq(ins, k + 1), wire_fq(ins, k + 2))


def wire_g2(ins, k: int) -> G2Wire:
    return G2Wire(wire_fq2(ins, k), wire_fq2(ins, k + 2), wire_fq2(ins, k + 4))
