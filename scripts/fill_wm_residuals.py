"""Sharded warm fill for the wm residual programs of the mega path.

The remote compile service serializes most concurrent compiles but ~3
clients still gain ~2.7x aggregate (docs/perf-model.md).  preload_mega's
residual loop is single-process; this script fills an interleaved shard of
the excluded (signature, S) programs so 2-3 processes can overlap the cold
compiles.  Each process skips the mega-module trace entirely (build_mega
staging is pure CPU/host arrays).

Usage: python scripts/fill_wm_residuals.py [B] [gplan] [top_k] [shard] [nshards]
"""

import os
import pickle
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    from gsv_tpu.core.jitcache import enable_if_tpu

    print("persistent cache:", enable_if_tpu(), flush=True)
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.devices()

    from gsv_tpu.circuit.mega import _wm_group_dev, build_mega
    from gsv_tpu.circuit.runtime import (
        GroupExecutor,
        _generic_group_jit_wm,
        tape_signature,
    )
    from gsv_tpu.circuit.schedule import GroupStep

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    path = sys.argv[2] if len(sys.argv) > 2 else ".gplan_k6_uniform_1048576_v3.pkl"
    top_k = int(sys.argv[3]) if len(sys.argv) > 3 else 24
    shard = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    nshards = int(sys.argv[5]) if len(sys.argv) > 5 else 1

    t0 = time.time()
    with open(path, "rb") as fh:
        gplan = pickle.load(fh)
    print(f"gplan loaded in {time.time()-t0:.0f}s", flush=True)

    ex = GroupExecutor(gplan, batch=B if B > 1 else None, hasher="aes_wm")
    st = build_mega(gplan, top_k=top_k,
                    chunk=int(os.environ.get("GSV_MEGA_CHUNK", "256")))
    excluded = sorted(st.excluded_sigs)
    mine = frozenset(k for i, k in enumerate(excluded)
                     if i % nshards == shard)
    print(f"{len(excluded)} excluded sigs; shard {shard}/{nshards} takes "
          f"{len(mine)}", flush=True)

    skip_gi = {int(x) for x in
               os.environ.get("GSV_FILL_SKIP_GI", "").split(",") if x}
    nb = B or 1
    A = ex.arena_size
    arena = jnp.zeros((4 * nb, A), jnp.uint32)
    delta = jnp.zeros((4 * nb,), jnp.uint32)
    digest = jnp.zeros((4 * nb,), jnp.uint32)
    fnr = _generic_group_jit_wm(ex.batch)
    seen = set()
    t0 = time.time()
    for gi, g in enumerate(gplan.steps):
        if not isinstance(g, GroupStep):
            continue
        k = (tape_signature(g.tape), g.header_maps.shape[0])
        if k not in mine or k in seen:
            continue
        if gi in skip_gi:  # a crasher under investigation — leave it cold
            print(f"[shard {shard}] skipping gi={gi}", flush=True)
            seen.add(k)
            continue
        seen.add(k)
        segs, oo, meta = ex._seg_dev(g.tape)
        hm, om, fb, ghi, glo, ct_loc, token, gid = _wm_group_dev(ex, g, gi)
        arena, digest = fnr(arena, token, hm, om, oo, fb, delta,
                            ghi, glo, ct_loc, digest, gid, segs)
        np.asarray(digest)  # honest: compiled + executed before the next
        print(f"[shard {shard}] {len(seen)}/{len(mine)} "
              f"({time.time()-t0:.0f}s)", flush=True)
    print(f"[shard {shard}] done: {len(seen)} programs in "
          f"{time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
