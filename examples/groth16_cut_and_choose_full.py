"""Cut-and-choose on the FULL (compressed) Groth16 verifier — the
reference's flagship protocol flow (examples/groth16_cut_and_choose.rs:
garble all instances, commit, challenge, audit the opened ones from their
seeds, evaluate the finalized ones on real proof bits).

Grouped TPU-native runtime: batched create, digest commitments, fused
finalized evaluation with device-consumed ciphertexts
(protocol/grouped_c2c.py).  The corrupted-proof rejection path is checked
alongside the honest one.

Usage: python examples/groth16_cut_and_choose_full.py [total] [finalize]
           [gplan.pkl] [--tpu] [--uncompressed]
Defaults: total=2 finalize=1, CPU, compressed verifier
(.gplan_k6_compressed_uniform_1048576.pkl from
 scripts/build_gplan.py 6 1048576 --compressed).
"""

import pickle
import random
import sys
import time

sys.path.insert(0, ".")

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    from gsv_tpu.core.logging import init_tracing

    init_tracing()  # progress lines (50M-gate cadence) to stderr
    from gsv_tpu.bn254_host.groth16 import dummy_proof, verify
    from gsv_tpu.protocol.cut_and_choose import Config, ConsistencyError
    from gsv_tpu.protocol.garbled_groth16 import ProofBits, select_active_labels
    from gsv_tpu.protocol.grouped_c2c import (
        GroupedEvaluator,
        GroupedGarbler,
        GroupedRunner,
    )

    if "--tpu" in sys.argv:
        from gsv_tpu.core.jitcache import enable_if_tpu

        enable_if_tpu()
    else:
        from gsv_tpu.core.jitcache import enable_cpu

        enable_cpu()  # same-machine CPU cache: restarts skip the compiles

    compressed = "--uncompressed" not in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    total = int(args[0]) if args else 2
    finalize = int(args[1]) if len(args) > 1 else 1
    tag = "compressed_" if compressed else ""
    path = args[2] if len(args) > 2 else f".gplan_k6_{tag}uniform_1048576.pkl"

    vk, proof, publics = dummy_proof(k=6, seed=0)
    assert verify(vk, proof, publics)
    pb = ProofBits.encode(
        [int(x) for x in publics], proof.a, proof.b, proof.c, compressed=compressed
    )

    t0 = time.time()
    with open(path, "rb") as fh:
        gplan = pickle.load(fh)
    print(
        f"gplan loaded in {time.time()-t0:.0f}s: {gplan.total_gates:,} gates x "
        f"{total} instances, {gplan.n_dispatches:,} dispatches",
        flush=True,
    )
    assert gplan.n_inputs == len(pb.bits), (gplan.n_inputs, len(pb.bits))

    import os

    # GSV_ARENA_SIZE: run at a shared (larger) arena so this plan reuses
    # group programs compiled for another plan at the same batch — e.g. the
    # uniform verifier's arena 2,542,805 (see GroupExecutor.arena_size).
    # batch_bucket=total: the audit re-garble and finalized evaluation pad
    # to the create batch instead of forcing their own compile fills.
    arena = int(os.environ.get("GSV_ARENA_SIZE", 0)) or None
    runner = GroupedRunner(gplan, batch_bucket=total, arena_size=arena)
    cfg = Config(total=total, to_finalize=finalize)

    t0 = time.time()
    garbler = GroupedGarbler(runner, cfg, seeds=list(range(101, 101 + total)))
    garbler.create()
    commits = garbler.commit()
    print(f"[garbler] {total} instances garbled + committed in "
          f"{time.time()-t0:.0f}s", flush=True)

    ev = GroupedEvaluator(random.Random(), cfg, commits)
    print(f"[evaluator] challenge: finalize {ev.to_finalize}", flush=True)

    open_seeds = garbler.open_commit(ev.to_finalize)
    t0 = time.time()
    ev.check_opened(runner, open_seeds)
    print(f"[evaluator] {len(open_seeds)} opened instance(s) re-garbled, "
          f"commits verified in {time.time()-t0:.0f}s", flush=True)

    for i in ev.to_finalize:
        inst = garbler.instances[i]
        wires = select_active_labels(inst.input_labels, pb)
        t0 = time.time()
        out = ev.evaluate_finalized(
            runner, garbler, i, wires,
            true_label=inst.true_wire.select(True),
            false_label=inst.false_wire.select(False),
        )
        print(f"[evaluator] instance {i}: value={out.value} in "
              f"{time.time()-t0:.0f}s (digest, labels, commits all checked)",
              flush=True)
        assert out.value, "valid proof must verify"

    # corrupted proof bit -> the circuit must output False (the label/commit
    # checks still pass: the evaluator chose a legitimate-but-wrong input)
    i = ev.to_finalize[0]
    inst = garbler.instances[i]
    bad = ProofBits(bits=list(pb.bits))
    bad.bits[0] = not bad.bits[0]
    wires = select_active_labels(inst.input_labels, bad)
    t0 = time.time()
    out = ev.evaluate_finalized(
        runner, garbler, i, wires,
        true_label=inst.true_wire.select(True),
        false_label=inst.false_wire.select(False),
    )
    print(f"[evaluator] corrupted-proof run: value={out.value} in "
          f"{time.time()-t0:.0f}s", flush=True)
    assert not out.value, "corrupted proof must fail"
    print("CUT-AND-CHOOSE FULL-VERIFIER FLOW PASSED", flush=True)


if __name__ == "__main__":
    main()
