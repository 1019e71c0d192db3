"""Warm-execution compile-cache filler — supersedes precompile_aot_group.py.

The AOT precompiler's ``.lower().compile()`` HLO does not byte-match the
HLO the GroupExecutor dispatch loop traces at run time (r4 discovery: a
"filled" cache still forced a full remote recompile per program on first
dispatch).  The only fill that provably matches is running the dispatch
path itself: GroupExecutor.preload_programs() warm-executes every distinct
group program on throwaway donated buffers, writing the runtime-keyed
persistent-cache entries as a side effect.

Usage: python scripts/warm_fill.py [B] [gplan.pkl] [mode ...]
  mode: garble_nocts (default) | garble | evaluate | execute
Restartable: warm cache entries load in seconds, cold ones recompile
(~40-45s each, mostly serialized by the remote compile service — a second
concurrent process with a disjoint GSV_FILL_SHARD-style split gains little;
threads inside this process already overlap what the service allows).
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

    jax.devices()

    from gsv_tpu.circuit.runtime import GroupExecutor

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    path = sys.argv[2] if len(sys.argv) > 2 else ".gplan_k6_uniform_1048576_v3.pkl"
    modes = tuple(sys.argv[3:]) or ("garble_nocts",)

    t0 = time.time()
    with open(path, "rb") as fh:
        gplan = pickle.load(fh)
    print(f"gplan loaded in {time.time()-t0:.0f}s", flush=True)

    hasher = os.environ.get("GSV_HASHER", "aes_pallas")
    ex = GroupExecutor(gplan, batch=B if B > 1 else None, hasher=hasher)
    dt = ex.preload_constants()
    print(f"constants preloaded in {dt:.0f}s", flush=True)
    if "mega" in modes:
        # mega dispatch: one big scan-over-switch program + residual
        # per-signature programs only (circuit/mega.py)
        from gsv_tpu.circuit.mega import preload_mega

        dt = preload_mega(
            ex,
            top_k=int(os.environ.get("GSV_MEGA_TOPK", "24")),
            chunk=int(os.environ.get("GSV_MEGA_CHUNK", "256")),
        )
        modes = tuple(m for m in modes if m != "mega")
    if modes:
        dt += ex.preload_programs(modes=modes)
    print(f"warm fill complete in {dt:.0f}s (hasher={hasher}, B={B})",
          flush=True)


if __name__ == "__main__":
    main()
