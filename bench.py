"""Benchmark: batched half-gates garbling throughput on the real chip.

Workload: the Fq12 Montgomery multiply circuit (~20.3M gates — the
reference's ``tests/fq12_mul_e2e.rs`` workload) garbled as a batch of
instances (the cut-and-choose axis).  Ciphertexts are consumed into a
checksum on-device so the AES work cannot be dead-code-eliminated.

Prints one JSON line: garbled gates/second vs the reference's published
aggregate throughput (~249M gates/s for 16 instances on 8 cores,
README.md:13; per-instance single-thread is ~32M gates/s).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from gsv_tpu.circuit.link import TapeStep
    from gsv_tpu.circuit.runtime import _garble_tape, _scatter_outputs
    from gsv_tpu.core.labels import words_from_int
    from gsv_tpu.core.rng import GarblerRng
    from gsv_tpu.models.groth16_verifier import fq12_mul_model

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    runner = fq12_mul_model()
    plan = runner.plan
    total_gates = runner.template.total_gates
    steps = [s for s in plan.steps if isinstance(s, TapeStep)]

    def one(arena, delta):
        checksum = jnp.zeros((4,), jnp.uint32)
        for st in steps:
            gid_hi = jnp.uint32(st.gid_base >> 32)
            gid_lo = jnp.uint32(st.gid_base & 0xFFFFFFFF)
            arena, cts = _garble_tape(
                st.tape, arena, jnp.asarray(st.header_map), st.frame_base,
                delta, gid_hi, gid_lo,
            )
            arena = _scatter_outputs(
                st.tape, arena, jnp.asarray(st.header_map), st.frame_base,
                jnp.asarray(st.outputs_map),
            )
            if st.tape.ct_count:
                checksum = checksum + cts.sum(axis=0)
        return arena[jnp.asarray(plan.output_abs)], checksum

    step = jax.jit(jax.vmap(one), donate_argnums=(0,))

    def make_batch(seed0):
        arenas = np.zeros((B, plan.arena_size, 4), dtype=np.uint32)
        deltas = np.zeros((B, 4), dtype=np.uint32)
        for i in range(B):
            rng = GarblerRng(seed0 + i)
            arenas[i, 0] = words_from_int(rng.false_label0)
            arenas[i, 1] = words_from_int(rng.true_label0)
            for k in range(plan.n_inputs):
                arenas[i, plan.input_abs[k]] = words_from_int(rng.issue_label0())
            deltas[i] = words_from_int(rng.delta)
        return jnp.asarray(arenas), jnp.asarray(deltas)

    # Keep a device-resident base batch; each rep derives a fresh (donated)
    # arena on-device so the timed loop never transfers through the tunnel.
    base_arenas, base_deltas = make_batch(1)
    perturb = jax.jit(lambda b, d, r: (b ^ r, d ^ r), donate_argnums=())

    # warm-up / compile
    a0, d0 = perturb(base_arenas, base_deltas, jnp.uint32(1))
    out, ck = step(a0, d0)
    jax.block_until_ready((out, ck))

    reps = 3
    t0 = time.perf_counter()
    for r in range(reps):
        ar, dr = perturb(base_arenas, base_deltas, jnp.uint32(100 + r))
        out, ck = step(ar, dr)
        jax.block_until_ready((out, ck))
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
