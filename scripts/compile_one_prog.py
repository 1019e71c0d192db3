"""Compile ONE grouped program, optionally ablated, to corner the remote
compiler crash (HTTP 500 / tpu_compile_helper exit 1) seen on v2-plan
programs with very wide header maps (Hb=262144) — scripts/precompile_aot_group
prog 5/6 at r3.

Usage:
  GSV_LANE_BUDGET=... python scripts/compile_one_prog.py <pkl> <prog_idx_1based>
      [--mode garble_nocts|garble|evaluate] [--batch 32]
      [--segs 0,1,2]      only these segment indices
      [--hb N]            clip the padded header width (compile-shape probe;
                          results are garbage, cache entry unused at bench)
      [--ctb N]           shrink the ciphertext buffer rows per site
      [--no-commit]       drop the digest fold (diagnostic only)

Every ablation changes the traced HLO, so entries it leaves in .jit_cache are
inert for the real bench — they only cost disk.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    args = sys.argv[1:]
    flags = {}
    pos = []
    i = 0
    while i < len(args):
        a = args[i]
        if a.startswith("--"):
            if a == "--no-commit":
                flags["no_commit"] = True
                i += 1
            else:
                flags[a[2:]] = args[i + 1]
                i += 2
        else:
            pos.append(a)
            i += 1
    path, idx = pos[0], int(pos[1])
    mode = flags.get("mode", "garble_nocts")
    B = int(flags.get("batch", 32))

    import pickle

    from gsv_tpu.circuit.runtime import (
        _generic_group_jit,
        padded_seg_args_group,
        tape_signature,
    )
    from gsv_tpu.circuit.schedule import GroupStep
    from gsv_tpu.core import jitcache

    jitcache.enable_if_tpu()

    emit_cts = mode != "garble_nocts"
    if mode == "garble_nocts":
        mode = "garble"
    commit = not flags.get("no_commit")

    with open(path, "rb") as fh:
        gplan = pickle.load(fh)
    progs = {}
    for g in gplan.steps:
        if isinstance(g, GroupStep):
            progs.setdefault((tape_signature(g.tape), g.header_maps.shape[0]), g)
    g = list(progs.values())[idx - 1]

    segs_np, oo_np, meta = padded_seg_args_group(g.tape)
    Hb, ctb, ob = meta["Hb"], meta["ctb"], meta["ob"]
    if "segs" in flags:
        keep = [int(x) for x in flags["segs"].split(",")]
        segs_np = [segs_np[k] for k in keep]
    if "hb" in flags:
        Hb = int(flags["hb"])
        segs_np = [
            {k: (np.minimum(v, Hb + g.tape.frame_size) if k in
                 ("f_a", "f_b", "f_c", "n_a", "n_b", "n_c") else v)
             for k, v in sv.items()}
            for sv in segs_np
        ]
    if "ctb" in flags:
        ctb = int(flags["ctb"])
    S = g.header_maps.shape[0]
    hm = np.full((S, Hb), 2, np.int32)
    hm[:, : min(Hb, g.header_maps.shape[1])] = g.header_maps[:, :Hb]
    om = np.full((S, max(ob, 1)), 2, np.int32)
    if g.outputs_maps.shape[1]:
        om[:, : g.outputs_maps.shape[1]] = g.outputs_maps
    fb = g.frame_bases.astype(np.int32)
    ghi = (g.gid_bases >> 32).astype(np.uint32)
    glo = (g.gid_bases & 0xFFFFFFFF).astype(np.uint32)
    ct_loc = (np.arange(S, dtype=np.int64) * ctb).astype(np.int32)
    token = np.zeros((S * ctb + 1, 0), np.uint32)
    arena = np.zeros((B, gplan.arena_size, 4) if B > 1 else (gplan.arena_size, 4), np.uint32)
    bits = np.zeros(arena.shape[:-1], np.uint8)
    delta = np.zeros((B, 4) if B > 1 else (4,), np.uint32)
    digest = np.zeros((B, 4) if B > 1 else (4,), np.uint32)

    jfn = _generic_group_jit(mode, "aes", B if B > 1 else None, commit, emit_cts=emit_cts)
    seg_desc = [
        (sv["f_a"].shape[0], sv["f_a"].shape[1], sv["n_a"].shape[1]) for sv in segs_np
    ]
    print(f"prog {idx}: S={S} Hb={Hb} ctb={ctb} segs(waves,cf,cn)={seg_desc}", flush=True)
    ts = time.time()
    if mode == "garble":
        low = jfn.lower(arena, token, hm, om, oo_np, fb, delta, ghi, glo,
                        ct_loc, digest, np.uint32(0), segs_np)
    else:
        cts_in = np.zeros((B, S * ctb + 1, 4) if B > 1 else (S * ctb + 1, 4), np.uint32)
        low = jfn.lower(arena, bits, cts_in, hm, om, oo_np, fb, ghi, glo,
                        ct_loc, digest, np.uint32(0), segs_np)
    print(f"lowered in {time.time()-ts:.1f}s", flush=True)
    ts = time.time()
    low.compile()
    print(f"COMPILED in {time.time()-ts:.1f}s", flush=True)


if __name__ == "__main__":
    main()
