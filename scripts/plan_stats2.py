"""Second-pass plan analysis: who produces the tiny deep steps, how mergeable
they are, and what the compile budget looks like if big and tiny steps are
handled separately.
"""

import pickle
import sys
from collections import Counter, defaultdict

sys.path.insert(0, ".")

import numpy as np

from gsv_tpu.circuit.link import CopyStep, TapeStep
from gsv_tpu.circuit.runtime import tape_signature

TINY = 10_000


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else ".plan_cache_k6_uncompressed_1048576.pkl"
    with open(path, "rb") as fh:
        plan = pickle.load(fh)
    steps = plan.steps

    # 1. per-template aggregation, split tiny/large
    agg = defaultdict(lambda: [0, 0, 0])  # name -> [steps, gates, waves]
    for s in steps:
        if not isinstance(s, TapeStep):
            continue
        t = s.tape
        key = (t.name, t.total_gates < TINY)
        a = agg[key]
        a[0] += 1
        a[1] += t.total_gates
        a[2] += t.streams.n_waves
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
    print("== top templates by step count ==")
    for (name, tiny), (ns, g, w) in rows[:25]:
        print(f"  {'T' if tiny else 'L'} {name[:60]:60s} steps={ns:7d} gates={g:12d} waves={w:9d}")

    # 2. consecutive-tiny run lengths
    runs = []
    cur = 0
    for s in steps:
        tiny = isinstance(s, TapeStep) and s.tape.total_gates < TINY
        if tiny:
            cur += 1
        elif cur:
            runs.append(cur)
            cur = 0
    if cur:
        runs.append(cur)
    r = np.array(runs)
    print(f"\n== consecutive tiny runs: n={len(r)} mean={r.mean():.1f} "
          f"p50={np.percentile(r,50):.0f} p90={np.percentile(r,90):.0f} max={r.max()}")
    print(f"   tiny steps total={r.sum()}")

    # 3. adjacency dependence between consecutive tiny steps
    dep = indep = 0
    prev_out = None
    prev_tiny = False
    for s in steps[:40000]:
        tiny = isinstance(s, TapeStep) and s.tape.total_gates < TINY
        if tiny and prev_tiny:
            ins = set(map(int, s.header_map))
            if prev_out & ins:
                dep += 1
            else:
                indep += 1
        if tiny:
            po = set(map(int, s.outputs_map))
            po.discard(2)
            prev_out = po
        prev_tiny = tiny
    print(f"\n== adjacent tiny pairs (first 40k steps): dep={dep} indep={indep}")

    # 4. signatures among big steps only
    bigsigs = {}
    tinysigs = {}
    for s in steps:
        if not isinstance(s, TapeStep):
            continue
        sig = tape_signature(s.tape)
        if s.tape.total_gates < TINY:
            tinysigs.setdefault(sig, 0)
            tinysigs[sig] += 1
        else:
            bigsigs.setdefault(sig, 0)
            bigsigs[sig] += 1
    both = set(bigsigs) & set(tinysigs)
    print(f"\n== signatures: big-only steps {len(bigsigs)}, tiny {len(tinysigs)}, overlap {len(both)}")
    bc = np.array(sorted(bigsigs.values())[::-1])
    print(f"   big sig usage: top10={bc[:10].tolist()} p50={np.percentile(bc,50):.0f}")
    # cumulative: how many big sigs cover 95/99% of big steps
    cum = np.cumsum(bc) / bc.sum()
    for q in (0.9, 0.95, 0.99, 1.0):
        k = int(np.searchsorted(cum, q)) + 1
        print(f"   {k} big sigs cover {q*100:.0f}% of big steps")

    # 5. copy steps
    cs = [len(s.src) for s in steps if isinstance(s, CopyStep)]
    print(f"\n== copy steps: n={len(cs)} total={sum(cs)} max={max(cs) if cs else 0}")

    # 6. gate-weighted lane width distribution over big tapes
    tapes = {}
    for s in steps:
        if isinstance(s, TapeStep):
            tapes.setdefault(s.tape.content_key, (s.tape, 0))
    # recount usage
    usage = Counter()
    for s in steps:
        if isinstance(s, TapeStep):
            usage[s.tape.content_key] += 1
    fw_hist = Counter()
    nw_hist = Counter()
    for ck, (t, _) in tapes.items():
        u = usage[ck]
        st = t.streams
        fw = np.diff(st.f_off)
        nw = np.diff(st.n_off)
        for width, cnt in zip(*np.unique(fw[fw > 0], return_counts=True)):
            fw_hist[1 << int(np.ceil(np.log2(max(width, 1))))] += int(cnt) * u * int(width)
        for width, cnt in zip(*np.unique(nw[nw > 0], return_counts=True)):
            nw_hist[1 << int(np.ceil(np.log2(max(width, 1))))] += int(cnt) * u * int(width)
    print("\n== gates by wave-width bucket (free):")
    tot = sum(fw_hist.values())
    for k in sorted(fw_hist):
        print(f"   <=2^{int(np.log2(k))}: {fw_hist[k]/tot*100:5.1f}%")
    print("== gates by wave-width bucket (nonfree):")
    tot = sum(nw_hist.values())
    for k in sorted(nw_hist):
        print(f"   <=2^{int(np.log2(k))}: {nw_hist[k]/tot*100:5.1f}%")

    # 7/8. tiny tape composition
    tg = tf = tn = 0
    for ck, (t, _) in tapes.items():
        if t.total_gates >= TINY:
            continue
        u = usage[ck]
        st = t.streams
        tg += t.total_gates * u
        tf += len(st.f_a) * u
        tn += len(st.n_a) * u
    print(f"\n== tiny tapes: total gates={tg} free={tf} nonfree={tn}")

    # 9. header map sizes of tiny steps (merge feasibility: combined header)
    hm = np.array([len(s.header_map) for s in steps
                   if isinstance(s, TapeStep) and s.tape.total_gates < TINY])
    om = np.array([len(s.outputs_map) for s in steps
                   if isinstance(s, TapeStep) and s.tape.total_gates < TINY])
    print(f"== tiny step header_map: p50={np.percentile(hm,50):.0f} p90={np.percentile(hm,90):.0f} max={hm.max()}")
    print(f"== tiny step outputs_map: p50={np.percentile(om,50):.0f} max={om.max()}")

    # 10. frame sizes
    fs = np.array([t.frame_size for t, _ in tapes.values()])
    print(f"== tape frame_size: p50={np.percentile(fs,50):.0f} max={fs.max()}")


if __name__ == "__main__":
    main()
