"""Benchmark: batched half-gates garbling throughput on the real chip.

Workload: the Fq12 Montgomery multiply circuit (~20.3M gates — the
reference's ``tests/fq12_mul_e2e.rs`` workload) garbled as a batch of
instances (the cut-and-choose axis), using the production per-tape jitted
executors.  Ciphertexts are consumed into an on-device checksum so the AES
work cannot be dead-code-eliminated; the timed loop never moves data through
the host tunnel.

Prints one JSON line: garbled gates/second vs the reference's published
aggregate throughput (~249M gates/s, 16 instances on 8 cores, README.md:13).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from gsv_tpu.core.jitcache import enable_if_tpu

    enable_if_tpu()

    from gsv_tpu.circuit.link import TapeStep
    from gsv_tpu.circuit.runtime import PlanExecutor
    from gsv_tpu.core.labels import words_from_int
    from gsv_tpu.core.rng import GarblerRng
    from gsv_tpu.models.groth16_verifier import fq12_mul_model

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    runner = fq12_mul_model()
    plan = runner.plan
    total_gates = runner.template.total_gates
    ex = PlanExecutor(plan, batch=B)

    # per-batch device-side checksum consuming every ciphertext block
    @jax.jit
    def absorb(ck, cts):
        return ck + cts.sum(axis=(1, 2))

    def make_base():
        arenas = np.zeros((B, plan.arena_size, 4), dtype=np.uint32)
        deltas = np.zeros((B, 4), dtype=np.uint32)
        for i in range(B):
            rng = GarblerRng(1 + i)
            arenas[i, 0] = words_from_int(rng.false_label0)
            arenas[i, 1] = words_from_int(rng.true_label0)
            for k in range(plan.n_inputs):
                arenas[i, plan.input_abs[k]] = words_from_int(rng.issue_label0())
            deltas[i] = words_from_int(rng.delta)
        return jnp.asarray(arenas), jnp.asarray(deltas)

    perturb = jax.jit(lambda b, d, r: (b ^ r, d ^ r))

    def run_once(arena, deltas):
        ck = jnp.zeros((B,), jnp.uint32)
        for st in plan.steps:
            if isinstance(st, TapeStep):
                fn = ex._fn(st.tape, "garble")
                hm, om, ghi, glo = ex._step_maps(st)
                arena, cts = fn(arena, hm, om, st.frame_base, deltas, ghi, glo)
                if st.tape.ct_count:
                    ck = absorb(ck, cts)
            else:
                arena = ex._copy_fn(len(st.src), "execute")(
                    arena, jnp.asarray(st.src), jnp.asarray(st.dst)
                )
        return arena, ck

    base_arenas, base_deltas = make_base()

    # warm-up / compile
    a0, d0 = perturb(base_arenas, base_deltas, jnp.uint32(1))
    _, ck = run_once(a0, d0)
    jax.block_until_ready(ck)

    reps = 3
    t0 = time.perf_counter()
    for r in range(reps):
        ar, dr = perturb(base_arenas, base_deltas, jnp.uint32(100 + r))
        _, ck = run_once(ar, dr)
        jax.block_until_ready(ck)
    dt = (time.perf_counter() - t0) / reps

    gates_per_sec = total_gates * B / dt
    baseline = 249e6  # reference 16-instance aggregate (README.md:13)
    print(
        json.dumps(
            {
                "metric": "garble_gates_per_sec",
                "value": round(gates_per_sec),
                "unit": "gates/s",
                "vs_baseline": round(gates_per_sec / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
