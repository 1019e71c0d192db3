"""Garbler→evaluator pipeline: overlapped 2PC execution on one device.

Reference parity: the producer/consumer threads connected by a crossbeam
channel of ciphertexts (``examples/groth16_garble.rs:171-265``,
``ciphertext_source.rs:23-32``).  On TPU the channel disappears: each tape
step's ciphertext block stays **device-resident** and feeds the evaluator's
step directly, while XLA's async dispatch overlaps the garbler's next step
with the evaluator's current one — evaluation rides right behind garbling
with no host round-trip.

An optional tee still forwards blocks to host handlers (hash commitment,
file spool), off the critical path.
"""

from __future__ import annotations

import numpy as np

from gsv_tpu.circuit.link import Plan, TapeStep
from gsv_tpu.circuit.runtime import PlanExecutor


def garble_evaluate_pipeline(
    plan: Plan,
    garbler_arena,
    delta,
    eval_arena,
    eval_bits,
    ct_tee=None,
):
    """Run garbling and evaluation step-locked over the same plan.

    ``garbler_arena``: (A, 4) uint32 with constants+input label0s seeded;
    ``eval_arena``/(A,4) + ``eval_bits``/(A,) with the evaluator's active
    labels and semantic bits.  Returns (garbler_arena, eval_arena, eval_bits)
    after the full plan.
    """
    import jax.numpy as jnp

    ex = PlanExecutor(plan)
    garbler_arena = jnp.asarray(garbler_arena)
    eval_arena = jnp.asarray(eval_arena)
    eval_bits = jnp.asarray(eval_bits)
    delta = jnp.asarray(delta)

    for st in plan.steps:
        if isinstance(st, TapeStep):
            hdr, outs, gid_hi, gid_lo = ex._step_maps(st)
            gfn = ex._fn(st.tape, "garble")
            garbler_arena, cts = gfn(
                garbler_arena, hdr, outs, st.frame_base, delta, gid_hi, gid_lo
            )
            if ct_tee is not None and st.tape.ct_count:
                ct_tee(cts)
            efn = ex._fn(st.tape, "evaluate")
            cts_in = cts if st.tape.ct_count else jnp.zeros((1, 4), jnp.uint32)
            eval_arena, eval_bits = efn(
                eval_arena, eval_bits, cts_in, hdr, outs, st.frame_base, gid_hi, gid_lo
            )
        else:
            cfn_g = ex._copy_fn(len(st.src), "execute")
            garbler_arena = cfn_g(garbler_arena, jnp.asarray(st.src), jnp.asarray(st.dst))
            cfn_e = ex._copy_fn(len(st.src), "evaluate")
            eval_arena, eval_bits = cfn_e(
                eval_arena, eval_bits, jnp.asarray(st.src), jnp.asarray(st.dst)
            )
    return garbler_arena, eval_arena, eval_bits


def seed_garbler_arena(plan: Plan, seed: int):
    """Arena + delta + label pairs for a fresh garbling instance."""
    from gsv_tpu.core.labels import words_from_int
    from gsv_tpu.core.rng import GarblerRng

    rng = GarblerRng(seed)
    arena = np.zeros((plan.arena_size, 4), dtype=np.uint32)
    arena[0] = words_from_int(rng.false_label0)
    arena[1] = words_from_int(rng.true_label0)
    labels = []
    for k in range(plan.n_inputs):
        l0 = rng.issue_label0()
        labels.append(l0)
        arena[plan.input_abs[k]] = words_from_int(l0)
    return arena, words_from_int(rng.delta), labels, rng


def seed_eval_arena(plan: Plan, rng: "GarblerRng", labels: list[int], bits: list[bool]):
    """Evaluator arena: active labels selected by bits + constants."""
    from gsv_tpu.core.labels import words_from_int

    arena = np.zeros((plan.arena_size, 4), dtype=np.uint32)
    bit_arr = np.zeros(plan.arena_size, dtype=np.uint8)
    arena[0] = words_from_int(rng.false_label0)
    arena[1] = words_from_int(rng.true_label0 ^ rng.delta)
    bit_arr[1] = 1
    for k, (l0, b) in enumerate(zip(labels, bits)):
        arena[plan.input_abs[k]] = words_from_int(l0 ^ (rng.delta if b else 0))
        bit_arr[plan.input_abs[k]] = int(b)
    return arena, bit_arr
