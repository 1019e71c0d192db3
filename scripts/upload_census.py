"""Census of host->device constant uploads for a GroupPlan pass.

The r3 warm pass spent ~2,237s enqueueing because every group step uploads
~7 small arrays (header/output maps, frame/gid bases, ct locations) and
every distinct tape uploads ~125 segment-argument leaves, each a separate
tunneled transfer with ~ms-scale fixed cost.  This script measures, from
the pickled plan alone (no device), exactly what a pooled-upload design
must move: total bytes, transfer counts, and distinct shape signatures
(= number of unpack programs to compile).

Usage: python scripts/upload_census.py [gplan.pkl]
"""

import pickle
import sys
from collections import Counter

sys.path.insert(0, ".")

import numpy as np

from gsv_tpu.circuit.runtime import padded_seg_args_group
from gsv_tpu.circuit.schedule import CopyStep, GroupStep


def main():
    pkl = sys.argv[1] if len(sys.argv) > 1 else ".gplan_k6_uniform_1048576.pkl"
    with open(pkl, "rb") as fh:
        plan = pickle.load(fh)

    groups = [g for g in plan.steps if isinstance(g, GroupStep)]
    copies = [g for g in plan.steps if isinstance(g, CopyStep)]
    print(f"steps={len(plan.steps)} groups={len(groups)} copies={len(copies)}")

    # --- per-tape segment leaves (uploaded once per distinct content key)
    seg_bytes = 0
    seg_leaves = 0
    seg_sigs = Counter()
    metas = {}
    seen = set()
    for g in groups:
        t = g.tape
        if t.content_key in seen:
            continue
        seen.add(t.content_key)
        segs_np, oo_np, meta = padded_seg_args_group(t)
        metas[t.content_key] = meta
        sig = tuple(
            tuple(sorted((f, v.shape, str(v.dtype)) for f, v in d.items()))
            for d in segs_np
        )
        seg_sigs[sig] += 1
        for d in segs_np:
            for v in d.values():
                seg_bytes += v.nbytes
                seg_leaves += 1
        seg_bytes += oo_np.nbytes
        seg_leaves += 1
    print(f"distinct tapes={len(seen)}  seg leaves={seg_leaves} "
          f"({seg_bytes/1e6:.1f} MB)  distinct seg shape-sigs={len(seg_sigs)}")

    # --- per-group maps (uploaded once per GroupStep)
    gm_bytes = 0
    gm_transfers = 0
    gm_sigs = Counter()
    for g in groups:
        meta = metas[g.tape.content_key]
        Hb, ob, ctb = meta["Hb"], meta["ob"], meta["ctb"]
        S = g.header_maps.shape[0]
        gm_bytes += S * Hb * 4 + S * max(ob, 1) * 4 + S * 4 * 4  # hm+om+fb/ghi/glo/ct_loc
        gm_transfers += 7
        gm_sigs[(S, Hb, max(ob, 1), ctb)] += 1
    print(f"group-map transfers={gm_transfers} ({gm_bytes/1e6:.1f} MB)  "
          f"distinct (S,Hb,ob,ctb) sigs={len(gm_sigs)}")

    # --- copy steps
    cp_bytes = sum(g.src.nbytes + g.dst.nbytes for g in copies)
    print(f"copy transfers={2*len(copies)} ({cp_bytes/1e6:.1f} MB)")

    tot = seg_bytes + gm_bytes + cp_bytes
    n = seg_leaves + gm_transfers + 2 * len(copies)
    print(f"TOTAL: {n} transfers, {tot/1e6:.1f} MB  "
          f"(pooled: ~{tot/8e6:.0f} x 8MB chunks)")
    print("top group-map sigs:", gm_sigs.most_common(8))


if __name__ == "__main__":
    main()
