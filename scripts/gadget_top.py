"""Per-gadget resource aggregates — analogue of the reference's
``.scripts/test_log_parser.bash`` (gadget_top.sh).

The reference parses per-gadget rows (count / cache entries / duration /
gates) out of test logs and prints a sortable table.  Here the same
accounting comes straight from the tracer: trace a model once and aggregate
per component template — instantiation count (call sites), template cache
hits/misses, and gate totals per distinct gadget name.

Usage:
  python scripts/gadget_top.py [-n TOP] [-s count|sum_gates|avg_gates|max_gates]
                               [-o asc|desc] [--model fq12|fq|verifier]
"""

import argparse
import sys
import time
from collections import defaultdict

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=0, help="top N rows (0 = all)")
    ap.add_argument("-s", default="sum_gates",
                    choices=["count", "sum_gates", "avg_gates", "max_gates"])
    ap.add_argument("-o", default="desc", choices=["asc", "desc"])
    ap.add_argument("--model", default="fq12", choices=["fq12", "fq", "verifier"])
    ap.add_argument("-k", type=int, default=1, help="verifier k (public inputs)")
    args = ap.parse_args()

    t0 = time.perf_counter()
    if args.model == "verifier":
        from gsv_tpu.models.groth16_verifier import Groth16VerifierModel

        cache = Groth16VerifierModel(k=args.k).runner().cache
    else:
        from gsv_tpu.models import groth16_verifier as m

        runner = (m.fq12_mul_model if args.model == "fq12" else m.fq_mul_model)()
        cache = runner.cache
    dt = time.perf_counter() - t0

    # aggregate templates by gadget NAME: distinct cache keys of one gadget
    # (shape variants) fold into one row, like the reference's per-gadget view
    rows = defaultdict(lambda: [0, 0, 0])  # name -> [templates, sum_gates, max_gates]
    for tmpl in cache.templates.values():
        r = rows[tmpl.name]
        r[0] += 1
        r[1] += int(tmpl.total_gates)
        r[2] = max(r[2], int(tmpl.total_gates))

    table = [
        {
            "gadget": name,
            "count": c,
            "sum_gates": sg,
            "avg_gates": sg // max(c, 1),
            "max_gates": mg,
        }
        for name, (c, sg, mg) in rows.items()
    ]
    table.sort(key=lambda r: r[args.s], reverse=args.o == "desc")
    if args.n:
        table = table[: args.n]

    hdr = f"{'gadget':40s} {'count':>7s} {'sum_gates':>12s} {'avg_gates':>12s} {'max_gates':>12s}"
    print(f"trace: {args.model} ({dt:.1f}s, {cache.hits} cache hits / "
          f"{cache.misses} misses, {len(cache.templates)} templates)")
    print(hdr)
    print("-" * len(hdr))
    for r in table:
        print(f"{r['gadget']:40s} {r['count']:7d} {r['sum_gates']:12d} "
              f"{r['avg_gates']:12d} {r['max_gates']:12d}")


if __name__ == "__main__":
    main()
