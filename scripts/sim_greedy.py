"""Simulate grouped-execution schedulers on the pickled verifier plan.

Compares:
  A) ASAP leveling, group = (level, content)
  B) greedy ready-max: repeatedly run ALL currently-ready steps of the
     content with the largest ready set (one dispatch per pick)

Cost model from scripts/bench_iter_cost.py on the v5e:
  T = dispatches * 0.45ms + seq_waves * 0.55us   (B=32, widths <= ~6k lanes)
"""

import pickle
import sys
import time
from collections import Counter, defaultdict

sys.path.insert(0, ".")

import numpy as np

from gsv_tpu.circuit.link import CopyStep, TapeStep

DISPATCH_S = 0.45e-3
WAVE_S = 0.55e-6


def build_deps(plan):
    steps = plan.steps
    n = len(steps)
    writer = np.full(plan.arena_size, -1, dtype=np.int64)  # last writer step
    preds = [None] * n
    for i, s in enumerate(steps):
        if isinstance(s, TapeStep):
            ins, outs = s.header_map, s.outputs_map
        else:
            ins, outs = np.asarray(s.src), np.asarray(s.dst)
        p = writer[ins]
        preds[i] = np.unique(p[p >= 0])
        outs = outs[outs != 2] if len(outs) else outs
        writer[outs] = i
    return preds


def cost(groups):
    d = len(groups)
    w = sum(g[1] for g in groups)
    return d, w, d * DISPATCH_S + w * WAVE_S


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else ".plan_cache_k6_uncompressed_1048576.pkl"
    t0 = time.time()
    with open(path, "rb") as fh:
        plan = pickle.load(fh)
    steps = plan.steps
    print(f"loaded in {time.time()-t0:.0f}s; building deps", flush=True)
    t0 = time.time()
    preds = build_deps(plan)
    n = len(steps)
    succs = [[] for _ in range(n)]
    indeg = np.zeros(n, dtype=np.int64)
    for i, p in enumerate(preds):
        indeg[i] = len(p)
        for j in p:
            succs[j].append(i)
    print(f"deps in {time.time()-t0:.0f}s", flush=True)

    def waves_of(i):
        s = steps[i]
        return s.tape.streams.n_waves if isinstance(s, TapeStep) else 1

    def content_of(i):
        s = steps[i]
        return s.tape.content_key if isinstance(s, TapeStep) else "__copy__"

    wv = np.array([waves_of(i) for i in range(n)], dtype=np.int64)
    ck = [content_of(i) for i in range(n)]

    # --- A) ASAP level grouping
    lvl = np.zeros(n, dtype=np.int64)
    for i in range(n):
        if len(preds[i]):
            lvl[i] = lvl[preds[i]].max() + 1
    groups = Counter()
    gwaves = {}
    for i in range(n):
        key = (int(lvl[i]), ck[i])
        groups[key] += 1
        gwaves[key] = wv[i]
    ga = [(c, gwaves[k]) for k, c in groups.items()]
    d, w, t = cost(ga)
    print(f"ASAP:   dispatches={d} waves={w} est={t:.1f}s  "
          f"(sizes p50={np.percentile([g[0] for g in ga],50):.0f} "
          f"max={max(g[0] for g in ga)})", flush=True)

    # --- B) greedy ready-max
    t0 = time.time()
    ready = defaultdict(set)  # content -> set of ready step ids
    for i in range(n):
        if indeg[i] == 0:
            ready[ck[i]].add(i)
    done = 0
    gb = []
    indeg2 = indeg.copy()
    while done < n:
        # pick content with max ready count
        best, bset = None, None
        for c, s in ready.items():
            if s and (bset is None or len(s) > len(bset)):
                best, bset = c, s
        batch = list(bset)
        ready[best] = set()
        done += len(batch)
        gb.append((len(batch), int(wv[batch[0]])))
        for i in batch:
            for j in succs[i]:
                indeg2[j] -= 1
                if indeg2[j] == 0:
                    ready[ck[j]].add(j)
    d, w, t = cost(gb)
    sizes = [g[0] for g in gb]
    print(f"GREEDY: dispatches={d} waves={w} est={t:.1f}s  "
          f"(sizes p50={np.percentile(sizes,50):.0f} max={max(sizes)}; "
          f"sim {time.time()-t0:.0f}s)", flush=True)

    # group-size histogram for bucket design
    h = Counter()
    for s_, w_ in gb:
        h[1 << int(np.ceil(np.log2(max(s_, 1))))] += 1
    print("greedy size histogram:", dict(sorted(h.items())), flush=True)


if __name__ == "__main__":
    main()
