"""Third-pass plan analysis for the executor redesign:

Per template family (tape.name): distinct contents, distinct signatures,
steps, gates, waves, padded content bytes (the HBM residency question),
plus wire-level ASAP level stats for grouped execution (how many same-tape
sites are ready per level -> achievable site-stacking S and the resulting
sequential wave count).
"""

import pickle
import sys
from collections import Counter, defaultdict

sys.path.insert(0, ".")

import numpy as np

from gsv_tpu.circuit.link import CopyStep, TapeStep
from gsv_tpu.circuit.runtime import padded_seg_args, tape_signature


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else ".plan_cache_k6_uncompressed_1048576.pkl"
    with open(path, "rb") as fh:
        plan = pickle.load(fh)
    steps = plan.steps

    # --- per-family content/signature/step stats
    tapes = {}
    usage = Counter()
    for s in steps:
        if isinstance(s, TapeStep):
            ck = s.tape.content_key
            tapes.setdefault(ck, s.tape)
            usage[ck] += 1

    fam = defaultdict(lambda: dict(contents=0, sigs=set(), steps=0, gates=0,
                                   waves=0, bytes=0, maxsig=None))
    for ck, t in tapes.items():
        f = fam[t.name]
        f["contents"] += 1
        sig = tape_signature(t)
        f["sigs"].add(sig)
        f["steps"] += usage[ck]
        f["gates"] += t.total_gates * usage[ck]
        f["waves"] += t.streams.n_waves * usage[ck]
        segs, oo, meta = padded_seg_args(t)
        nb = sum(sum(a.nbytes for a in d.values()) for d in segs)
        f["bytes"] += nb

    print("== families: name contents sigs steps gates waves padded_MB ==")
    rows = sorted(fam.items(), key=lambda kv: -len(kv[1]["sigs"]))
    tot_b = tot_sig = 0
    for name, f in rows:
        tot_b += f["bytes"]
        tot_sig += len(f["sigs"])
        print(f"  {name[:48]:48s} {f['contents']:5d} {len(f['sigs']):5d} "
              f"{f['steps']:7d} {f['gates']:13d} {f['waves']:11d} "
              f"{f['bytes']/1e6:9.1f}")
    print(f"TOTAL families={len(rows)} sigs={tot_sig} padded_bytes={tot_b/1e9:.2f} GB")

    # --- wire-level ASAP leveling of steps using slot-dataflow is falsely
    # conservative; approximate true deps via (slot, last-writer version):
    # track per-slot version; a step depends on the current version writers
    # of its input slots.  This equals true dataflow because slots are SSA
    # between writes.
    lvl_of_slot = np.zeros(plan.arena_size, dtype=np.int64)
    step_lvl = np.zeros(len(steps), dtype=np.int64)
    for i, s in enumerate(steps):
        if isinstance(s, TapeStep):
            ins = s.header_map
            lv = int(lvl_of_slot[ins].max()) if len(ins) else 0
            step_lvl[i] = lv + 1
            outs = s.outputs_map
            if len(outs):
                lvl_of_slot[outs] = lv + 1
        else:
            src = np.asarray(s.src); dst = np.asarray(s.dst)
            lv = int(lvl_of_slot[src].max()) if len(src) else 0
            step_lvl[i] = lv + 1
            lvl_of_slot[dst] = lv + 1

    n_lvl = int(step_lvl.max())
    print(f"\n== ASAP levels: {n_lvl} levels for {len(steps)} steps")

    # per level: group by tape content; sequential waves = sum over groups of
    # that tape's wave count; dispatches = number of groups
    lvl_groups = defaultdict(Counter)  # level -> content_key -> count
    for i, s in enumerate(steps):
        if isinstance(s, TapeStep):
            lvl_groups[int(step_lvl[i])][s.tape.content_key] += 1

    total_disp = 0
    total_waves = 0
    smax = 0
    s_hist = Counter()
    for lv, groups in lvl_groups.items():
        for ck, cnt in groups.items():
            total_disp += 1
            total_waves += tapes[ck].streams.n_waves
            smax = max(smax, cnt)
            s_hist[1 << int(np.ceil(np.log2(max(cnt, 1))))] += 1
    print(f"grouped-by-content: dispatches={total_disp} seq_waves={total_waves} "
          f"(was {sum(t.streams.n_waves*usage[ck] for ck, t in tapes.items())}) max_S={smax}")
    print("group-size histogram (pow2 buckets -> n_groups):")
    for k in sorted(s_hist):
        print(f"   S<={k}: {s_hist[k]}")

    # group by SIGNATURE instead of content (stacked-content execution)
    lvl_sig_groups = defaultdict(Counter)
    sig_of = {ck: tape_signature(t) for ck, t in tapes.items()}
    waves_of_sig = {}
    for ck, t in tapes.items():
        waves_of_sig[sig_of[ck]] = max(waves_of_sig.get(sig_of[ck], 0), t.streams.n_waves)
    for i, s in enumerate(steps):
        if isinstance(s, TapeStep):
            lvl_sig_groups[int(step_lvl[i])][sig_of[s.tape.content_key]] += 1
    td = tw = 0
    for lv, groups in lvl_sig_groups.items():
        for sg, cnt in groups.items():
            td += 1
            tw += waves_of_sig[sg]
    print(f"grouped-by-signature: dispatches={td} seq_waves={tw}")


if __name__ == "__main__":
    main()
