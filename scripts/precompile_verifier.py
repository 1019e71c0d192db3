"""Warm the persistent compile cache with the full verifier's tape programs.

Builds the Groth16 verifier plan, dedupes tapes by bucketed shape
signature, and warm-calls one representative per signature sequentially so
every compiled executable lands in ``.jit_cache/`` (see
``gsv_tpu.core.jitcache``).  The remote compile service serializes
programs (~40s each), so this is a long background job; it is restartable —
already-cached signatures fly through on later runs.

Usage: python scripts/precompile_verifier.py [B] [flatten_max] [mode]
(mode: garble | evaluate | execute; garble first — it is the headline path)
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gsv_tpu.core.jitcache import enable_if_tpu

    print("persistent cache:", enable_if_tpu(), flush=True)

    from gsv_tpu.bn254_host.groth16 import dummy_proof
    from gsv_tpu.circuit.link import TapeStep
    from gsv_tpu.circuit.runtime import PlanExecutor, tape_signature
    from gsv_tpu.models.groth16_verifier import Groth16VerifierModel

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    flatten_max = int(sys.argv[2]) if len(sys.argv) > 2 else (1 << 20)
    mode = sys.argv[3] if len(sys.argv) > 3 else "garble"

    # the compiled+linked plan is pure data; pickle it so restarts (and
    # later rounds) skip the ~9-minute trace/compile/link
    import os
    import pickle

    plan_cache = f".plan_cache_k6_uncompressed_{flatten_max}.pkl"
    t0 = time.time()
    if os.path.exists(plan_cache):
        with open(plan_cache, "rb") as fh:
            plan = pickle.load(fh)
        print(f"plan loaded from cache in {time.time()-t0:.0f}s", flush=True)
    else:
        vk, proof, publics = dummy_proof(k=6, seed=0)
        model = Groth16VerifierModel(
            vk=vk, n_public=len(publics), compressed=False, flatten_max=flatten_max
        )
        plan = model.runner.plan
        print(f"plan ready in {time.time()-t0:.0f}s", flush=True)
        t0 = time.time()
        with open(plan_cache + ".tmp", "wb") as fh:
            pickle.dump(plan, fh, protocol=5)
        os.replace(plan_cache + ".tmp", plan_cache)
        print(f"plan pickled in {time.time()-t0:.0f}s", flush=True)

    sigs = {}
    for st in plan.steps:
        if isinstance(st, TapeStep):
            sigs.setdefault(tape_signature(st.tape), st)
    work = list(sigs.values())
    print(f"{len(work)} shape signatures to warm", flush=True)

    ex = PlanExecutor(plan, batch=B if B > 1 else None)
    shape = (B, plan.arena_size, 4) if B > 1 else (plan.arena_size, 4)
    arena = jnp.zeros(shape, jnp.uint32)
    delta = jnp.zeros((B, 4) if B > 1 else (4,), jnp.uint32)

    bits = jnp.zeros(shape[:-1], jnp.uint8)
    t0 = time.time()
    failed = 0
    for n, st in enumerate(work, 1):
        # the remote compile service occasionally recycles its helper
        # (HTTP 500 / signal 15) — retry, then skip the signature
        for attempt in range(3):
            try:
                fn = ex._fn(st.tape, mode)
                hm, om, ghi, glo = ex._step_maps(st)
                if mode == "garble":
                    arena, _ = fn(arena, hm, om, st.frame_base, delta, ghi, glo)
                elif mode == "execute":
                    bits = fn(bits, hm, om, st.frame_base)
                else:  # evaluate
                    cts_in = jnp.zeros(
                        (
                            (B, max(st.tape.ct_count, 1), 4)
                            if B > 1
                            else (max(st.tape.ct_count, 1), 4)
                        ),
                        jnp.uint32,
                    )
                    arena, bits = fn(
                        arena, bits, cts_in, hm, om, st.frame_base, ghi, glo
                    )
                jax.block_until_ready(arena if mode != "execute" else bits)
                break
            except Exception as e:  # noqa: BLE001
                print(
                    f"  [warn] sig {n} attempt {attempt+1}: "
                    f"{type(e).__name__}: {str(e)[:100]}",
                    flush=True,
                )
                time.sleep(10 * (attempt + 1))
                # a failed garble call may have consumed the donated arena
                arena = jnp.zeros(shape, jnp.uint32)
                bits = jnp.zeros(shape[:-1], jnp.uint8)
        else:
            failed += 1
        # Keep RSS flat: the compiled executable is persisted in the cache;
        # the per-tape segment uploads / wrappers / built segments are not
        # needed again in this process.
        ex._fns.pop(("segs", st.tape.content_key), None)
        ex._fns.pop((st.tape.content_key, mode, ex.hasher), None)
        ex._fns.pop(("maps", id(st)), None)
        object.__setattr__(st.tape, "_segments", None)
        if n % 3 == 0:
            import gc

            gc.collect()
        rss_kb = int(open("/proc/self/status").read().split("VmRSS:")[1].split()[0])
        if rss_kb > 45_000_000:
            print(f"RSS {rss_kb//1024}MB too high; exiting for restart", flush=True)
            return
        if n % 5 == 0 or n == len(work):
            dt = time.time() - t0
            print(
                f"  {n}/{len(work)} warmed ({dt:.0f}s, {dt/n:.1f}s/sig, "
                f"{failed} failed)",
                flush=True,
            )
    print(f"precompile complete ({failed} failed)", flush=True)


if __name__ == "__main__":
    main()
