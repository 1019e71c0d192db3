"""Garble the FULL Groth16 verifier circuit on the real chip.

The reference's headline: 11,174,708,821 gates garbled in ~5m50s single-core
(~32M gates/s), ~249M gates/s aggregate over 16 instances on 8 cores.  This
drives the whole ~10.7B-gate verifier plan through the TPU garbling
executors with a device-side ciphertext checksum (so AES work can't be
DCE'd) and reports gates/s.

Usage: python examples/bench_groth16_garble.py [B]
"""

import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gsv_tpu.core.jitcache import enable_if_tpu

    enable_if_tpu()

    from gsv_tpu.bn254_host.groth16 import dummy_proof
    from gsv_tpu.circuit.link import TapeStep
    from gsv_tpu.circuit.runtime import PlanExecutor
    from gsv_tpu.core.labels import words_from_int
    from gsv_tpu.core.rng import GarblerRng
    from gsv_tpu.models.groth16_verifier import Groth16VerifierModel

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    flatten_max = int(sys.argv[2]) if len(sys.argv) > 2 else (1 << 23)
    print("devices:", jax.devices(), flush=True)

    vk, proof, publics = dummy_proof(k=6, seed=0)
    model = Groth16VerifierModel(
        vk=vk, n_public=len(publics), compressed=False, flatten_max=flatten_max
    )
    t0 = time.time()
    runner = model.runner  # trace + compile + link
    total = runner.template.total_gates
    plan = runner.plan
    print(
        f"plan ready in {time.time()-t0:.0f}s: {total:,} gates, "
        f"{len(plan.steps)} steps, arena {plan.arena_size:,}",
        flush=True,
    )

    ex = PlanExecutor(plan, batch=B if B > 1 else None)

    @jax.jit
    def absorb(ck, cts):
        return ck + cts.sum(axis=(-2, -1))

    def run_once(arena, deltas):
        ck = jnp.zeros((B,) if B > 1 else (), jnp.uint32)
        n_done = 0
        t_start = time.time()
        for st in plan.steps:
            if isinstance(st, TapeStep):
                fn = ex._fn(st.tape, "garble")
                hm, om, ghi, glo = ex._step_maps(st)
                arena, cts = fn(arena, hm, om, st.frame_base, deltas, ghi, glo)
                if st.tape.ct_count:
                    ck = absorb(ck, cts)
                n_done += st.tape.total_gates
                if n_done % 500_000_000 < st.tape.total_gates:
                    print(
                        f"  ... {n_done/1e9:.1f}B gates dispatched "
                        f"({time.time()-t_start:.0f}s)",
                        flush=True,
                    )
            else:
                arena = ex._copy_fn(len(st.src), "execute")(
                    arena, jnp.asarray(st.src), jnp.asarray(st.dst)
                )
        return arena, ck

    shape = (B, plan.arena_size, 4) if B > 1 else (plan.arena_size, 4)
    arenas = np.zeros(shape, dtype=np.uint32)
    dshape = (B, 4) if B > 1 else (4,)
    deltas = np.zeros(dshape, dtype=np.uint32)
    for i in range(max(B, 1)):
        rng = GarblerRng(1 + i)
        tgt = arenas[i] if B > 1 else arenas
        tgt[0] = words_from_int(rng.false_label0)
        tgt[1] = words_from_int(rng.true_label0)
        for k in range(plan.n_inputs):
            tgt[plan.input_abs[k]] = words_from_int(rng.issue_label0())
        if B > 1:
            deltas[i] = words_from_int(rng.delta)
        else:
            deltas[:] = words_from_int(rng.delta)

    # -- threaded compile warm-up: remote compiles are IO-bound POSTs, so
    # overlapping them across threads hides round-trip latency.  Each thread
    # chains a donated dummy arena through its share of the distinct tapes
    # (donation keeps HBM flat; values are garbage, only the jit cache
    # matters).  Dedupe key matches PlanExecutor._fn's cache key.
    from concurrent.futures import ThreadPoolExecutor

    seen = set()
    distinct = []
    for st in plan.steps:
        if isinstance(st, TapeStep) and st.tape.content_key not in seen:
            seen.add(st.tape.content_key)
            distinct.append(st)
    distinct_gates = sum(st.tape.total_gates for st in distinct)

    # The generic executors key XLA compilation on the bucketed shape
    # signature alone, so warm-calling ONE representative tape per signature
    # compiles everything.
    from gsv_tpu.circuit.runtime import tape_signature

    t0 = time.time()
    sigs = {}
    for st in distinct:
        sigs.setdefault(tape_signature(st.tape), st)
    work = list(sigs.values())
    threads = int(os.environ.get("GSV_COMPILE_THREADS", "4"))
    print(
        f"{len(distinct)} distinct tapes ({distinct_gates/1e6:.0f}M distinct gates) "
        f"-> {len(work)} shape signatures (sig scan {time.time()-t0:.0f}s); "
        f"compiling on {threads} threads...",
        flush=True,
    )
    t0 = time.time()

    def worker(idx):
        arena = jnp.zeros(shape, jnp.uint32)
        d = jnp.asarray(deltas)
        n = 0
        for st in work[idx::threads]:
            ts = time.time()
            fn = ex._fn(st.tape, "garble")
            hm, om, ghi, glo = ex._step_maps(st)
            arena, _cts = fn(arena, hm, om, st.frame_base, d, ghi, glo)
            n += 1
            if n <= 3 or n % 5 == 0:
                jax.block_until_ready(arena)
                print(
                    f"  [t{idx}] {n}/{len(work[idx::threads])} tapes "
                    f"(last {st.tape.total_gates/1e6:.2f}M gates in "
                    f"{time.time()-ts:.1f}s; total {time.time()-t0:.0f}s)",
                    flush=True,
                )
        jax.block_until_ready(arena)

    with ThreadPoolExecutor(threads) as pool:
        list(pool.map(worker, range(threads)))
    print(f"compile warm-up done in {time.time()-t0:.0f}s", flush=True)

    print("execution warm-up pass...", flush=True)
    t0 = time.time()
    _, ck = run_once(jnp.asarray(arenas), jnp.asarray(deltas))
    jax.block_until_ready(ck)
    print(f"warm-up done in {time.time()-t0:.0f}s", flush=True)

    t0 = time.time()
    _, ck = run_once(jnp.asarray(arenas), jnp.asarray(deltas))
    jax.block_until_ready(ck)
    dt = time.time() - t0
    rate = total * max(B, 1) / dt
    print(
        f"FULL GROTH16 GARBLE: {total:,} gates x{B} in {dt:.1f}s "
        f"= {rate/1e6:.0f} Mgates/s  "
        f"(reference single-instance: 32M/s, 16x8core: 249M/s)",
        flush=True,
    )


if __name__ == "__main__":
    main()
