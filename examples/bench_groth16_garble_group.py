"""Garble the FULL Groth16 verifier on the real chip via the grouped plan.

The reference's headline: 11,174,708,821 gates in ~5m50s single-core
(~32M gates/s), ~249M gates/s aggregate over 16 instances / 8 cores
(/root/reference/README.md:12).  This drives the whole ~10.76B-gate
verifier GroupPlan (schedule.py: 184,973 steps -> ~34.8k dispatches)
through the grouped garbling executor at batch B, with the device-side
streaming commitment enabled (every ciphertext is AES-absorbed into a
16-byte digest on-device), and reports sustained gates/s.

Usage: python examples/bench_groth16_garble_group.py [B] [gplan.pkl]
Requires a warm .jit_cache (scripts/precompile_aot_group.py).
"""

import json
import pickle
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax

    from gsv_tpu.core.jitcache import enable_if_tpu

    enable_if_tpu()
    from gsv_tpu.core.logging import init_tracing

    init_tracing()  # progress lines (50M-gate cadence) to stderr

    from gsv_tpu.circuit.runtime import GroupExecutor
    from gsv_tpu.core.labels import words_from_int, words_from_int_array
    from gsv_tpu.core.rng import GarblerRng

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    path = sys.argv[2] if len(sys.argv) > 2 else ".gplan_k6_uniform_1048576.pkl"
    print("devices:", jax.devices(), flush=True)

    t0 = time.time()
    with open(path, "rb") as fh:
        gplan = pickle.load(fh)
    print(
        f"gplan loaded in {time.time()-t0:.0f}s: {gplan.total_gates:,} gates, "
        f"{gplan.n_dispatches:,} dispatches, arena {gplan.arena_size:,}",
        flush=True,
    )

    batch = B if B > 1 else None
    ex = GroupExecutor(gplan, batch=batch)

    # per-instance independent garbler seeds (cut-and-choose style)
    rngs = [GarblerRng(1 + i) for i in range(max(B, 1))]
    in_l0 = np.stack(
        [words_from_int_array([r.issue_label0() for r in rngs])
         for _ in range(gplan.n_inputs)],
        axis=1,
    )  # (B, n_inputs, 4)
    delta = words_from_int_array([r.delta for r in rngs])
    f0 = words_from_int_array([r.false_label0 for r in rngs])
    t0s = words_from_int_array([r.true_label0 for r in rngs])
    if batch is None:
        in_l0, delta, f0, t0s = in_l0[0], delta[0], f0[0], t0s[0]
    else:
        # GroupExecutor broadcasts false/true rows; give it per-batch rows
        pass

    def run_once(tag):
        t = time.time()
        out, _, digest = ex.garble(
            in_l0, delta,
            f0 if batch is None else f0,
            t0s if batch is None else t0s,
            ct_handler=None, commit=True,
        )
        dt = time.time() - t
        print(f"{tag}: {dt:.1f}s  digest[0]={np.asarray(digest).reshape(-1, 4)[0]}",
              flush=True)
        return dt

    print("warm-up pass (uploads + compile-cache hits)...", flush=True)
    run_once("warm-up")
    dt = run_once("timed")
    rate = gplan.total_gates * max(B, 1) / dt
    print(
        f"FULL GROTH16 GARBLE (grouped, committed): "
        f"{gplan.total_gates:,} gates x{B} in {dt:.1f}s = {rate/1e6:.0f} Mgates/s "
        f"(reference 1-core: 32M/s, 16x8core: 249M/s)",
        flush=True,
    )
    print(json.dumps({
        "metric": "full_groth16_garble_gates_per_s",
        "value": rate,
        "unit": "gates/s",
        "vs_baseline": rate / 249e6,
    }), flush=True)


if __name__ == "__main__":
    main()
