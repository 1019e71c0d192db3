"""Plan-structure statistics to drive the round-2 dispatch-coalescing design.

Loads the pickled full-verifier plan and reports: step/tape/signature counts,
gates-per-step distribution, run lengths of consecutive steps sharing a tape
content / shape signature, segment-count distribution, and padded content
sizes under the current bucketing — the numbers that decide between
scan-over-runs, coarser bucketing, or super-tape merging.
"""

import pickle
import sys
from collections import Counter

sys.path.insert(0, ".")

import numpy as np

from gsv_tpu.circuit.link import CopyStep, TapeStep
from gsv_tpu.circuit.runtime import tape_signature


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else ".plan_cache_k6_uncompressed_1048576.pkl"
    with open(path, "rb") as fh:
        plan = pickle.load(fh)
    steps = plan.steps
    tsteps = [s for s in steps if isinstance(s, TapeStep)]
    csteps = [s for s in steps if isinstance(s, CopyStep)]
    print(f"steps={len(steps)} tape={len(tsteps)} copy={len(csteps)}")
    print(f"arena={plan.arena_size} total_gates={plan.total_gates} cts={plan.ct_count}")

    tapes = {}
    for s in tsteps:
        tapes.setdefault(s.tape.content_key, s.tape)
    print(f"distinct tapes={len(tapes)}")
    sigs = {}
    for t in tapes.values():
        sigs.setdefault(tape_signature(t), []).append(t)
    print(f"distinct signatures={len(sigs)}")

    g = np.array([s.tape.total_gates for s in tsteps], dtype=np.int64)
    print(f"gates/step: min={g.min()} p50={np.percentile(g,50):.0f} "
          f"p90={np.percentile(g,90):.0f} p99={np.percentile(g,99):.0f} max={g.max()}")
    # how much of the total is in small steps?
    for thr in (1000, 10_000, 100_000, 1_000_000):
        sel = g < thr
        print(f"  steps<{thr}: {sel.sum()} steps, {g[sel].sum()/g.sum()*100:.1f}% of gates")

    # run lengths over consecutive TapeSteps (CopySteps break runs)
    def runs(keyfn):
        out = []
        cur_key, cur_len = None, 0
        for s in steps:
            k = keyfn(s) if isinstance(s, TapeStep) else ("COPY", id(s))
            if k == cur_key:
                cur_len += 1
            else:
                if cur_len:
                    out.append(cur_len)
                cur_key, cur_len = k, 1
        out.append(cur_len)
        return np.array(out)

    for name, keyfn in [
        ("content", lambda s: s.tape.content_key),
        ("signature", lambda s: tape_signature(s.tape)),
    ]:
        r = runs(keyfn)
        print(f"runs by {name}: n={len(r)} mean={r.mean():.2f} p90={np.percentile(r,90):.0f} max={r.max()}")

    # segment counts / wave stats per tape
    nseg = np.array([len(t.segments) for t in tapes.values()])
    print(f"segments/tape: p50={np.percentile(nseg,50):.0f} p90={np.percentile(nseg,90):.0f} max={nseg.max()}")
    waves = np.array([sum(s.n_waves for s in t.segments) for t in tapes.values()])
    print(f"waves/tape: p50={np.percentile(waves,50):.0f} p90={np.percentile(waves,90):.0f} max={waves.max()}")
    cfcn = Counter()
    for t in tapes.values():
        for s in t.segments:
            cfcn[(s.cf, s.cn)] += 1
    print(f"distinct (cf,cn) lane classes: {len(cfcn)}; top10={cfcn.most_common(10)}")

    # total padded content bytes under current bucketing (device-resident cost)
    from gsv_tpu.circuit.runtime import padded_seg_args
    tot = 0
    for t in tapes.values():
        segs, oo, meta = padded_seg_args(t)
        for d in segs:
            for v in d.values():
                tot += v.nbytes
    print(f"padded distinct-tape content: {tot/1e9:.2f} GB")

    # weighted: if content were stacked per step (scan-over-runs worst case)
    per_tape = {}
    for t in tapes.values():
        segs, oo, meta = padded_seg_args(t)
        per_tape[t.content_key] = sum(v.nbytes for d in segs for v in d.values())
    tot_steps = sum(per_tape[s.tape.content_key] for s in tsteps)
    print(f"per-step stacked content (no sharing): {tot_steps/1e9:.2f} GB")

    # header sizes
    H = np.array([t.header_size for t in tapes.values()])
    print(f"header: p50={np.percentile(H,50):.0f} p90={np.percentile(H,90):.0f} max={H.max()}")
    ct = np.array([t.ct_count for t in tapes.values()])
    print(f"ct/tape: p50={np.percentile(ct,50):.0f} max={ct.max()}")
    om = np.array([len(s.outputs_map) for s in tsteps])
    print(f"outputs_map/step: p50={np.percentile(om,50):.0f} max={om.max()}")
    hm = np.array([len(s.header_map) for s in tsteps])
    print(f"header_map/step: p50={np.percentile(hm,50):.0f} max={hm.max()}")


if __name__ == "__main__":
    main()
