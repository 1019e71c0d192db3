"""Gate-count run emitting the CI-badge JSON schema
(reference: examples/groth16_gc_gate_count.rs — the source of the
11,174,708,821 badge for the compressed k=6 verifier).

Usage: python examples/groth16_gc_gate_count.py [--compressed] [--json]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

from gsv_tpu.bn254_host.groth16 import dummy_proof
from gsv_tpu.circuit import trace_circuit
from gsv_tpu.core.gate_types import GateCount
from gsv_tpu.core.progress import humanize
from gsv_tpu.protocol.garbled_groth16 import build_2pc_circuit


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--uncompressed", action="store_true")
    ap.add_argument("-k", type=int, default=6)
    args = ap.parse_args()

    vk, proof, publics = dummy_proof(k=args.k, seed=0)
    fn, n_inputs = build_2pc_circuit(
        vk, n_public=len(publics), compressed=not args.uncompressed
    )
    t0 = time.time()
    tmpl, _ = trace_circuit(fn, n_inputs)
    gc = GateCount(tmpl.hist)
    elapsed = time.time() - t0

    if args.json:
        print(
            json.dumps(
                {
                    "total": gc.total,
                    "nonfree": gc.nonfree,
                    "free": gc.free,
                    "total_formatted": humanize(gc.total),
                    "nonfree_formatted": humanize(gc.nonfree),
                    "free_formatted": humanize(gc.free),
                }
            )
        )
    else:
        print(f"traced in {elapsed:.0f}s")
        print(f"total:   {gc.total:>15,}")
        print(f"nonfree: {gc.nonfree:>15,}")
        print(f"free:    {gc.free:>15,}")
        print(gc.as_dict()["per_type"])


if __name__ == "__main__":
    main()
