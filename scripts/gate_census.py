"""Per-gadget gate census of the Groth16 verifier trace.

Dumps the component-template call tree with gate totals so the circuit's
gate count can be diffed stage-by-stage against a hand-walk of the
reference (`/root/reference/src/gadgets/groth16.rs:57-110`,
`bn254/pairing.rs:945-1010`).  This is the executable cost-model artifact
VERDICT r1 (Weak #5) asked for.

Usage: python scripts/gate_census.py [-k 6] [--compressed] [--depth 4]
"""

import argparse
import sys
import time
from collections import defaultdict

sys.path.insert(0, ".")

from gsv_tpu.bn254_host.groth16 import dummy_proof
from gsv_tpu.circuit import trace_circuit
from gsv_tpu.protocol.garbled_groth16 import build_2pc_circuit


def walk(tmpl, depth, max_depth, path, lines):
    if depth > max_depth:
        return
    # aggregate identical child templates at this level
    groups = defaultdict(lambda: [0, None])
    order = []
    for call in tmpl.calls:
        k = id(call.template)
        if k not in groups:
            order.append(k)
        groups[k][0] += 1
        groups[k][1] = call.template
    for k in order:
        n, t = groups[k]
        lines.append(
            f"{'  ' * depth}{t.name}  x{n}  total={t.total_gates:,}"
            f"  (sum={n * t.total_gates:,})  own={t.own_gates:,}"
        )
        walk(t, depth + 1, max_depth, path + (t.name,), lines)


def flat_counts(tmpl):
    """name -> (ncalls, gates_per_call) over the whole tree (template-dedup'd
    by identity; ncalls counts dynamic instantiations)."""
    counts = defaultdict(lambda: [0, 0])

    def rec(t, mult):
        for call in t.calls:
            c = counts[call.template.name]
            c[0] += mult
            c[1] = call.template.total_gates
            rec(call.template, mult)

    rec(tmpl, 1)
    return counts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-k", type=int, default=6)
    ap.add_argument("--compressed", action="store_true")
    ap.add_argument("--depth", type=int, default=3)
    ap.add_argument("--flat", action="store_true")
    args = ap.parse_args()

    vk, proof, publics = dummy_proof(k=args.k, seed=0)
    fn, n_inputs = build_2pc_circuit(
        vk, n_public=len(publics), compressed=args.compressed
    )
    t0 = time.time()
    tmpl, _ = trace_circuit(fn, n_inputs)
    print(f"traced in {time.time()-t0:.0f}s; TOTAL = {tmpl.total_gates:,}")
    print(f"(reference badge uncompressed k=6: 11,174,708,821)")
    lines = []
    walk(tmpl, 0, args.depth, (), lines)
    print("\n".join(lines))
    if args.flat:
        print("\n--- flat call counts ---")
        for name, (n, g) in sorted(
            flat_counts(tmpl).items(), key=lambda kv: -kv[1][0] * kv[1][1]
        ):
            print(f"{name:50s} x{n:<8d} per={g:>14,}  sum={n*g:>16,}")


if __name__ == "__main__":
    main()
