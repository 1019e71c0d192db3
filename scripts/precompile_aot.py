"""AOT compile-cache filler for the full verifier's tape programs.

Unlike `precompile_verifier.py` (which warm-EXECUTES one step per shape
signature: ~42s/signature even on cache hits, dominated by tunnel uploads,
arena allocation and execution), this walks every signature with
`jit(...).lower(*host_args).compile()`:

- lowering uses only avals — no H2D, no device buffers, no execution;
- `.compile()` consults the persistent cache (`.jit_cache/`): hits load in
  seconds, misses go to the remote compile service (the unavoidable ~40s).

The host args replicate the runtime's exact avals (python-int frame_base →
weak int32; numpy arrays → canonicalized dtypes), so the executables cached
here are the ones `PlanExecutor` loads at run time.

Usage: python scripts/precompile_aot.py [B] [flatten_max] [mode]
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

    from gsv_tpu.circuit.link import TapeStep
    from gsv_tpu.circuit.runtime import (
        _generic_jit,
        _pad_map,
        padded_seg_args,
        tape_signature,
    )

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    flatten_max = int(sys.argv[2]) if len(sys.argv) > 2 else (1 << 20)
    mode = sys.argv[3] if len(sys.argv) > 3 else "garble"

    plan_cache = f".plan_cache_k6_uncompressed_{flatten_max}.pkl"
    t0 = time.time()
    if os.path.exists(plan_cache):
        with open(plan_cache, "rb") as fh:
            plan = pickle.load(fh)
        print(f"plan loaded from cache in {time.time()-t0:.0f}s", flush=True)
    else:
        from gsv_tpu.bn254_host.groth16 import dummy_proof
        from gsv_tpu.models.groth16_verifier import Groth16VerifierModel

        vk, proof, publics = dummy_proof(k=6, seed=0)
        model = Groth16VerifierModel(
            vk=vk, n_public=len(publics), compressed=False, flatten_max=flatten_max
        )
        plan = model.runner.plan
        print(f"plan built in {time.time()-t0:.0f}s", flush=True)
        with open(plan_cache + ".tmp", "wb") as fh:
            pickle.dump(plan, fh, protocol=5)
        os.replace(plan_cache + ".tmp", plan_cache)

    sigs = {}
    for st in plan.steps:
        if isinstance(st, TapeStep):
            sigs.setdefault(tape_signature(st.tape), st)
    work = list(sigs.values())
    print(f"{len(work)} shape signatures", flush=True)

    # avals shared across signatures
    arena = np.zeros(
        (B, plan.arena_size, 4) if B > 1 else (plan.arena_size, 4), np.uint32
    )
    bits = np.zeros(arena.shape[:-1], np.uint8)
    delta = np.zeros((B, 4) if B > 1 else (4,), np.uint32)

    jfn = _generic_jit(mode, "aes", B if B > 1 else None)
    t0 = time.time()
    done = failed = 0
    for n, st in enumerate(work, 1):
        segs_np, oo_np, meta = padded_seg_args(st.tape)
        Hb, ctb, ob = meta["Hb"], meta["ctb"], meta["ob"]
        hm = np.asarray(_pad_map(np.asarray(st.header_map), Hb))
        om = np.asarray(_pad_map(np.asarray(st.outputs_map), ob))
        token = np.zeros((max(ctb, 0) + 1, 0), np.uint32)
        ghi = np.uint32(st.gid_base >> 32)
        glo = np.uint32(st.gid_base & 0xFFFFFFFF)
        for attempt in range(3):
            try:
                ts = time.time()
                if mode == "garble":
                    low = jfn.lower(
                        arena, token, hm, om, oo_np, st.frame_base,
                        delta, ghi, glo, segs_np,
                    )
                elif mode == "execute":
                    low = jfn.lower(bits, hm, om, oo_np, st.frame_base, segs_np)
                else:  # evaluate
                    cts_in = np.zeros(
                        (B, max(ctb, 1), 4) if B > 1 else (max(ctb, 1), 4),
                        np.uint32,
                    )
                    low = jfn.lower(
                        arena, bits, cts_in, hm, om, oo_np, st.frame_base,
                        ghi, glo, segs_np,
                    )
                low.compile()
                done += 1
                dt = time.time() - ts
                if dt > 5 or n % 25 == 0 or n == len(work):
                    print(
                        f"  {n}/{len(work)} ({'compiled' if dt > 5 else 'hit'} "
                        f"{dt:.1f}s; total {time.time()-t0:.0f}s, {failed} failed)",
                        flush=True,
                    )
                break
            except Exception as e:  # noqa: BLE001
                print(
                    f"  [warn] sig {n} attempt {attempt+1}: "
                    f"{type(e).__name__}: {str(e)[:140]}",
                    flush=True,
                )
                time.sleep(10 * (attempt + 1))
        else:
            failed += 1
        rss_kb = int(open("/proc/self/status").read().split("VmRSS:")[1].split()[0])
        if rss_kb > 60_000_000:
            print(f"RSS {rss_kb//1024}MB too high; exiting for restart", flush=True)
            return
    print(f"precompile complete ({failed} failed)", flush=True)


if __name__ == "__main__":
    main()
