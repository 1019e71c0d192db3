"""Per-gadget cost aggregator — the `test_log_parser.bash` analogue.

The reference aggregates `component_metrics name=…` test-log lines into a
sorted per-gadget table (count / cache entries / duration / gates; see
`/root/reference/.scripts/test_log_parser.bash`).  We don't scrape logs:
the traced template DAG already carries exact per-component gate counts and
the template pool carries the cache stats, so this walks the DAG and prints
the same table deterministically.

Per qualname: call count (DAG multiplicity), distinct cached templates
("cache_entries"), summed/avg/max total gates, and summed own (non-child)
gates.  Sort keys and -n/-s/-o flags mirror the reference tool's CLI.

Usage: python scripts/component_top.py [model] [-n TOP] [-s KEY] [-o asc|desc]
  model: fq_mul | fq12_mul | groth16[:k] | groth16_compressed[:k]  (default fq12_mul)
  KEY:   count | cache_entries | sum_gates | avg_gates | max_gates | sum_own_gates
"""

from __future__ import annotations

import argparse
import sys
import time
from collections import defaultdict

sys.path.insert(0, ".")


def build(model: str):
    if model == "fq_mul":
        from gsv_tpu.models.groth16_verifier import fq_mul_model

        return fq_mul_model()
    if model == "fq12_mul":
        from gsv_tpu.models.groth16_verifier import fq12_mul_model

        return fq12_mul_model()
    name, _, karg = model.partition(":")
    if name in ("groth16", "groth16_compressed"):
        from gsv_tpu.bn254_host.groth16 import setup_test_circuit
        from gsv_tpu.models.groth16_verifier import Groth16VerifierModel

        k = int(karg) if karg else 6
        vk, n_public = setup_test_circuit(k)
        return Groth16VerifierModel(
            vk, n_public, compressed=name.endswith("compressed")
        ).runner
    raise SystemExit(f"unknown model {model!r} (fq_mul|fq12_mul|groth16[:k])")


def aggregate(root, cache):
    """DAG walk: exact call multiplicity per template via memoized counts."""
    # multiplicity[template id] = number of times it is instantiated in the
    # fully expanded circuit; children multiply through parents
    mult = defaultdict(int)
    mult[id(root)] = 1
    order = []  # topological (parents before children) via DFS postorder
    seen = {}
    stack = [root]
    while stack:
        t = stack.pop()
        if id(t) in seen:
            continue
        seen[id(t)] = t
        order.append(t)
        for c in t.calls:
            stack.append(c.template)
    # templates form a DAG keyed by component key; propagate multiplicities
    # in dependency order (repeat until stable is overkill — do Kahn-style
    # by depth: process a template only once all parents are done)
    parents = defaultdict(int)
    for t in seen.values():
        for c in t.calls:
            parents[id(c.template)] += 1
    from collections import deque

    q = deque([t for t in seen.values() if parents[id(t)] == 0])
    while q:
        t = q.popleft()
        child_counts = defaultdict(int)
        by_id = {}
        for c in t.calls:
            child_counts[id(c.template)] += 1
            by_id[id(c.template)] = c.template
        for cid, n in child_counts.items():
            mult[cid] += n * mult[id(t)]
            parents[cid] -= n
            if parents[cid] == 0:
                q.append(by_id[cid])

    rows = defaultdict(lambda: dict(count=0, cache_entries=0, sum_gates=0,
                                    sum_own_gates=0, max_gates=0))
    for t in seen.values():
        r = rows[t.name]
        n = mult[id(t)]
        r["count"] += n
        r["cache_entries"] += 1
        r["sum_gates"] += n * t.total_gates
        r["sum_own_gates"] += n * t.own_gates
        r["max_gates"] = max(r["max_gates"], t.total_gates)
    hits = getattr(cache, "hits", 0)
    misses = getattr(cache, "misses", 0)
    return rows, hits, misses


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("model", nargs="?", default="fq12_mul")
    ap.add_argument("-n", type=int, default=0, help="top N rows (0 = all)")
    ap.add_argument("-s", default="sum_gates",
                    choices=["count", "cache_entries", "sum_gates",
                             "avg_gates", "max_gates", "sum_own_gates"])
    ap.add_argument("-o", default="desc", choices=["asc", "desc"])
    args = ap.parse_args()

    t0 = time.perf_counter()
    runner = build(args.model)
    template, cache = runner.template, runner.cache
    dt = time.perf_counter() - t0
    rows, hits, misses = aggregate(template, cache)

    def key(item):
        name, r = item
        if args.s == "avg_gates":
            return r["sum_gates"] / max(r["count"], 1)
        return r[args.s]

    items = sorted(rows.items(), key=key, reverse=(args.o == "desc"))
    if args.n:
        items = items[: args.n]
    print(f"model={args.model} trace={dt:.1f}s "
          f"templates={len(cache.templates)} cache_hits={hits} "
          f"cache_misses={misses} total_gates={template.total_gates:,}")
    hdr = (f"{'name':40s} {'count':>10s} {'tmpls':>6s} {'sum_gates':>16s} "
           f"{'avg_gates':>12s} {'max_gates':>12s} {'sum_own':>14s}")
    print(hdr)
    print("-" * len(hdr))
    for name, r in items:
        avg = r["sum_gates"] / max(r["count"], 1)
        print(f"{name[:40]:40s} {r['count']:>10,d} {r['cache_entries']:>6d} "
              f"{r['sum_gates']:>16,d} {avg:>12,.0f} {r['max_gates']:>12,d} "
              f"{r['sum_own_gates']:>14,d}")


if __name__ == "__main__":
    main()
