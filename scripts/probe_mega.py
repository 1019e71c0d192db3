"""Probe: mega-dispatch staging stats + one on-chip chunk execution.

Usage: python scripts/probe_mega.py [B] [gplan.pkl] [top_k] [chunk] [--stats]
With --stats: CPU-only, print the schedule shape (mega chunks, residual
dispatches, padding) and exit — no TPU touched.
Otherwise: compile the mega program on the chip (remote compile — minutes),
time one warm chunk execution, and report blocks/s + per-chunk wall.
"""

import os
import pickle
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    B = int(args[0]) if args else 32
    path = args[1] if len(args) > 1 else ".gplan_k6_uniform_1048576_v3.pkl"
    top_k = int(args[2]) if len(args) > 2 else 40
    chunk = int(args[3]) if len(args) > 3 else 256
    stats_only = "--stats" in sys.argv

    if stats_only:
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        from gsv_tpu.core.jitcache import enable_if_tpu

        print("persistent cache:", enable_if_tpu(), flush=True)
        import jax

        jax.devices()

    from gsv_tpu.circuit.mega import build_mega
    from gsv_tpu.circuit.runtime import GroupExecutor

    t0 = time.time()
    with open(path, "rb") as fh:
        gplan = pickle.load(fh)
    print(f"gplan loaded in {time.time()-t0:.0f}s "
          f"({len(gplan.steps)} steps, {gplan.total_gates/1e9:.2f}B gates)",
          flush=True)

    t0 = time.time()
    st = build_mega(gplan, top_k=top_k, chunk=chunk)
    n_mega = st.bidx.shape[0]
    n_steps_sched = sum(1 for k, _ in st.schedule if k == "step")
    pad = n_mega * chunk - st.n_branch_steps
    print(
        f"staging built in {time.time()-t0:.0f}s: "
        f"{len(st.layout)} branches, {n_mega} mega chunks, "
        f"{n_steps_sched} residual dispatches "
        f"({st.n_excluded} excluded steps), "
        f"{st.n_branch_steps} covered steps, {pad} no-op padding "
        f"({100*pad/max(1, n_mega*chunk):.1f}%), "
        f"args={sum(a.nbytes for a in st.arrays)/1e6:.0f}MB in {len(st.arrays)} arrays, "
        f"total executions/pass={n_mega + n_steps_sched}",
        flush=True,
    )
    from collections import Counter

    kinds = Counter(k for k, _ in st.schedule)
    print(f"schedule: {dict(kinds)}", flush=True)
    if stats_only:
        return

    import jax.numpy as jnp
    import numpy as np

    from gsv_tpu.circuit.mega import _mega_stage_dev

    hasher = os.environ.get("GSV_HASHER", "aes_pallas")
    ex = GroupExecutor(gplan, batch=B if B > 1 else None, hasher=hasher)
    ex._dev[("megastage", top_k, chunk)] = st
    t0 = time.time()
    st, dev, fn = _mega_stage_dev(ex, top_k, chunk)
    ARRS, BIDX, POS = dev
    print(f"pools uploaded in {time.time()-t0:.0f}s", flush=True)

    A = ex.arena_size
    if hasher == "aes_wm":
        nb = B if B > 1 else 1
        arena = jnp.zeros((4, nb, A), jnp.uint32)
        delta = jnp.zeros((4, nb), jnp.uint32)
        digest = jnp.zeros((4, nb), jnp.uint32)
    else:
        Bsh = (B, A, 4) if B > 1 else (A, 4)
        arena = jnp.zeros(Bsh, jnp.uint32)
        delta = jnp.zeros(Bsh[:-2] + (4,), jnp.uint32)
        digest = jnp.zeros(Bsh[:-2] + (4,), jnp.uint32)
    t0 = time.time()
    arena, digest = fn(arena, digest, delta, BIDX[0], POS[0], *ARRS)
    np.asarray(digest)
    print(f"first chunk (compile+load+exec) in {time.time()-t0:.0f}s",
          flush=True)
    # warm timing over a few chunks
    n_time = min(8, st.bidx.shape[0])
    gates = int(st.chunk_gates[:n_time].sum()) * (B if B > 1 else 1)
    t0 = time.time()
    for i in range(n_time):
        arena, digest = fn(arena, digest, delta, BIDX[i], POS[i], *ARRS)
    np.asarray(digest)
    dt = time.time() - t0
    print(
        f"warm: {n_time} chunks in {dt:.2f}s = {dt/n_time*1e3:.0f}ms/chunk, "
        f"{gates/dt/1e6:.0f}M gates/s over these chunks",
        flush=True,
    )


if __name__ == "__main__":
    main()
