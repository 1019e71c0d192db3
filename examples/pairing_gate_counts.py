"""Per-op gate counts for pairing sub-gadgets, streamed as CSV rows
(reference: examples/pairing_gate_counts.rs).

Usage: python examples/pairing_gate_counts.py
"""

import sys
import time

sys.path.insert(0, ".")

from gsv_tpu.bn254_host.curve import g1_gen, g2_gen
from gsv_tpu.bn254_host.field import Fq as HFq, Fq2 as HFq2
from gsv_tpu.circuit import trace_circuit
from gsv_tpu.gadgets.bigint import BigIntWires
from gsv_tpu.gadgets.bn254.fq import Fq, FqWire
from gsv_tpu.gadgets.bn254.fq2 import Fq2, Fq2Wire
from gsv_tpu.gadgets.bn254.fq6 import Fq6Wire
from gsv_tpu.gadgets.bn254.fq12 import Fq12, Fq12Wire
from gsv_tpu.gadgets.bn254.g1 import G1Ops, G1Wire
from gsv_tpu.gadgets.bn254.g2 import G2Ops, G2Wire
from gsv_tpu.gadgets.bn254 import pairing as P
from gsv_tpu.gadgets.bn254.final_exponentiation import final_exponentiation_montgomery


def fqw(ins, k):
    return FqWire(BigIntWires(ins[k * 254 : (k + 1) * 254]))


def fq2w(ins, k):
    return Fq2Wire(fqw(ins, k), fqw(ins, k + 1))


def fq12w(ins, base):
    fqs = [fqw(ins, base + i) for i in range(12)]
    return Fq12Wire(
        Fq6Wire(*[Fq2Wire(fqs[2 * i], fqs[2 * i + 1]) for i in range(3)]),
        Fq6Wire(*[Fq2Wire(fqs[6 + 2 * i], fqs[7 + 2 * i]) for i in range(3)]),
    )


def g1w(ins, base):
    return G1Wire(fqw(ins, base), fqw(ins, base + 1), fqw(ins, base + 2))


def g2w(ins, base):
    return G2Wire(fq2w(ins, base), fq2w(ins, base + 2), fq2w(ins, base + 4))


def count(name, fn, n):
    t0 = time.time()
    tmpl, _ = trace_circuit(fn, n)
    print(f"{name},{tmpl.total_gates}", flush=True)
    return tmpl.total_gates


def main():
    print("test_name,total_gates")
    count("fq_mul_montgomery", lambda c, i: Fq.mul_montgomery(c, fqw(i, 0), fqw(i, 1)), 2 * 254)
    count("fq_inverse", lambda c, i: Fq.inverse_montgomery(c, fqw(i, 0)), 254)
    count("fq2_mul_montgomery", lambda c, i: Fq2.mul_montgomery(c, fq2w(i, 0), fq2w(i, 2)), 4 * 254)
    count("fq2_square", lambda c, i: Fq2.square_montgomery(c, fq2w(i, 0)), 2 * 254)
    count("fq12_mul", lambda c, i: Fq12.mul_montgomery(c, fq12w(i, 0), fq12w(i, 12)), 24 * 254)
    count("fq12_square", lambda c, i: Fq12.square_montgomery(c, fq12w(i, 0)), 12 * 254)
    count(
        "fq12_cyclotomic_square",
        lambda c, i: Fq12.cyclotomic_square_montgomery(c, fq12w(i, 0)),
        12 * 254,
    )
    count("g1_add", lambda c, i: G1Ops.add_montgomery(c, g1w(i, 0), g1w(i, 3)), 6 * 254)
    count("g1_double", lambda c, i: G1Ops.double_montgomery(c, g1w(i, 0)), 3 * 254)
    count("g2_add", lambda c, i: G2Ops.add_montgomery(c, g2w(i, 0), g2w(i, 6)), 12 * 254)
    count(
        "double_in_place",
        lambda c, i: list(P.double_in_place_circuit_montgomery(c, g2w(i, 0))),
        6 * 254,
    )
    count(
        "add_in_place",
        lambda c, i: list(P.add_in_place_montgomery(c, g2w(i, 0), g2w(i, 6))),
        12 * 254,
    )
    coeff = (HFq2(HFq(3), HFq(5)), HFq2(HFq(7), HFq(11)), HFq2(HFq(13), HFq(17)))
    count(
        "ell_by_constant",
        lambda c, i: P.ell_by_constant_montgomery(
            c, fq12w(i, 0), coeff, G1Wire(fqw(i, 12), fqw(i, 13), FqWire.new_constant(1))
        ),
        14 * 254,
    )
    q = g2_gen()
    count(
        "miller_loop_const_q_affine",
        lambda c, i: P.miller_loop_const_q_affine(
            c,
            G1Wire(fqw(i, 0), fqw(i, 1), FqWire.new_constant(1)),
            q_key=P.g2_key(q),
        ),
        2 * 254,
    )
    count(
        "final_exponentiation",
        lambda c, i: final_exponentiation_montgomery(c, fq12w(i, 0)),
        12 * 254,
    )


if __name__ == "__main__":
    main()
