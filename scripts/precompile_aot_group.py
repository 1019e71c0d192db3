"""AOT compile-cache filler for GROUP programs (schedule.py executor).

Same approach as precompile_aot.py (lower from host avals + .compile(), so
cache hits never touch the device), but over the grouped plan's
(tape signature, S-bucket) program set — tens of programs instead of ~967.

Usage: python scripts/precompile_aot_group.py [B] [gplan.pkl] [mode] [commit]
"""

import os
import pickle
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax

    from gsv_tpu.core.jitcache import enable_if_tpu

    print("persistent cache:", enable_if_tpu(), flush=True)

    from gsv_tpu.circuit.runtime import (
        _generic_group_jit,
        padded_seg_args_group,
        tape_signature,
    )
    from gsv_tpu.circuit.schedule import GroupStep

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    path = sys.argv[2] if len(sys.argv) > 2 else ".gplan_k6_uniform_1048576.pkl"
    mode = sys.argv[3] if len(sys.argv) > 3 else "garble"
    emit_cts = mode != "garble_nocts"  # deep-pipeline variant (digest only)
    if mode == "garble_nocts":
        mode = "garble"
    commit = (len(sys.argv) > 4 and sys.argv[4] == "commit") or mode in (
        "garble",
        "evaluate",  # protocol path verifies the consumed-stream digest
    )

    t0 = time.time()
    with open(path, "rb") as fh:
        gplan = pickle.load(fh)
    print(f"gplan loaded in {time.time()-t0:.0f}s", flush=True)

    progs = {}
    for g in gplan.steps:
        if isinstance(g, GroupStep):
            progs.setdefault((tape_signature(g.tape), g.header_maps.shape[0]), g)
    work = list(progs.values())
    # GSV_FILL_SHARD="k/n": compile only every n-th program starting at k —
    # lets n processes fill concurrently (compile RPCs are lowering-bound on
    # the host side; cache hits make overlap between shards nearly free)
    shard = os.environ.get("GSV_FILL_SHARD")
    if shard:
        k, nsh = (int(x) for x in shard.split("/"))
        work = work[k::nsh]
    print(f"{len(work)} group programs ({mode}, commit={commit}"
          + (f", shard {shard}" if shard else "") + ")", flush=True)

    # GSV_ARENA_SIZE: compile at a shared arena size (>= the plan's own) so
    # multiple plans reuse one another's programs — see GroupExecutor.
    A = max(int(os.environ.get("GSV_ARENA_SIZE", 0)), gplan.arena_size)
    arena = np.zeros((B, A, 4) if B > 1 else (A, 4), np.uint32)
    bits = np.zeros(arena.shape[:-1], np.uint8)
    delta = np.zeros((B, 4) if B > 1 else (4,), np.uint32)
    digest = np.zeros((B, 4) if B > 1 else (4,), np.uint32)

    t0 = time.time()
    done = failed = 0
    packed = os.environ.get("GSV_PACKED_SEGS", "0") == "1"
    hasher = os.environ.get("GSV_HASHER", "aes")
    from gsv_tpu.circuit.runtime import (
        _packed_group_jit,
        pack_seg_args,
        use_packed_segs,
    )

    for n, g in enumerate(work, 1):
        # fresh jit object per program + cache clear below: retained
        # Lowered/Compiled objects were the ~1GB/program RSS leak
        segs_np, oo_np, meta = padded_seg_args_group(g.tape)
        if packed and not use_packed_segs(g.tape, g.header_maps.shape[0]):
            print(f"  {n}/{len(work)} siteloop-class: plain segs variant",
                  flush=True)
        if packed and use_packed_segs(g.tape, g.header_maps.shape[0]):
            p32, p8, layout = pack_seg_args(segs_np)
            jfn = _packed_group_jit(mode, hasher, B if B > 1 else None,
                                    commit, emit_cts, layout)
            tail = (p32, p8)
        else:
            jfn = _generic_group_jit(mode, hasher, B if B > 1 else None,
                                     commit, emit_cts=emit_cts)
            tail = (segs_np,)
        Hb, ctb, ob = meta["Hb"], meta["ctb"], meta["ob"]
        S = g.header_maps.shape[0]
        hm = np.full((S, Hb), 2, np.int32)
        hm[:, : g.header_maps.shape[1]] = g.header_maps
        om = np.full((S, max(ob, 1)), 2, np.int32)
        if g.outputs_maps.shape[1]:
            om[:, : g.outputs_maps.shape[1]] = g.outputs_maps
        fb = g.frame_bases.astype(np.int32)
        ghi = (g.gid_bases >> 32).astype(np.uint32)
        glo = (g.gid_bases & 0xFFFFFFFF).astype(np.uint32)
        ct_loc = (np.arange(S, dtype=np.int64) * ctb).astype(np.int32)
        token = np.zeros((S * ctb + 1, 0), np.uint32)
        for attempt in range(3):
            try:
                ts = time.time()
                if mode == "garble":
                    low = jfn.lower(
                        arena, token, hm, om, oo_np, fb, delta, ghi, glo,
                        ct_loc, digest, np.uint32(0), *tail,
                    )
                elif mode == "execute":
                    low = jfn.lower(bits, hm, om, oo_np, fb, *tail)
                else:  # evaluate
                    cts_in = np.zeros(
                        (B, S * ctb + 1, 4) if B > 1 else (S * ctb + 1, 4),
                        np.uint32,
                    )
                    low = jfn.lower(
                        arena, bits, cts_in, hm, om, oo_np, fb, ghi, glo,
                        ct_loc, digest, np.uint32(0), *tail,
                    )
                low.compile()
                done += 1
                dt = time.time() - ts
                print(
                    f"  {n}/{len(work)} ({'compiled' if dt > 5 else 'hit'} "
                    f"{dt:.1f}s; total {time.time()-t0:.0f}s, {failed} failed)",
                    flush=True,
                )
                break
            except Exception as e:  # noqa: BLE001
                print(
                    f"  [warn] prog {n} attempt {attempt+1}: "
                    f"{type(e).__name__}: {str(e)[:140]}",
                    flush=True,
                )
                time.sleep(10 * (attempt + 1))
        else:
            failed += 1
        # drop the compiled/lowered objects — the persistent .jit_cache
        # entry is already written; retaining them leaked ~1GB/program
        low = None
        import jax as _jax
        from gsv_tpu.circuit import runtime as _rt

        _jax.clear_caches()
        _rt._GROUP_JITS.clear()
        rss_kb = int(open("/proc/self/status").read().split("VmRSS:")[1].split()[0])
        if rss_kb > 60_000_000:
            print(f"RSS {rss_kb//1024}MB too high; exiting for restart", flush=True)
            return
    print(f"precompile complete ({failed} failed)", flush=True)


if __name__ == "__main__":
    main()
