"""Full-verifier garble->evaluate 2PC roundtrip over the grouped plan.

Mirrors the reference's examples/groth16_garble.rs:88-268 flow (garbler
streams ciphertexts to an evaluator who runs the circuit on active labels)
with the TPU-native architecture: both parties advance group-locked and
each group's ciphertext buffer is consumed on-device the moment it is
produced, so the ~172GB stream never exists at once.

Checks (per instance):
  - evaluator's consumed-stream digest == garbler's commitment digest
  - output value: valid proof -> 1; corrupted input bit (instance 1 when
    B >= 2) -> 0 (reference run_false_bitflip_test, gadgets/groth16.rs)
  - active output label == output label0 ^ value*delta

Usage: python examples/groth16_2pc_roundtrip.py [B] [gplan.pkl] [--tpu]
CPU by default (hours of XLA:CPU compiles on first run; cached in-process
only).  --tpu needs a warm .jit_cache for garble AND evaluate programs.
"""

import json
import pickle
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
    from gsv_tpu.circuit.runtime import GroupExecutor
    from gsv_tpu.core.labels import (
        int_array_from_words,
        words_from_int,
        words_from_int_array,
    )
    from gsv_tpu.core.rng import GarblerRng
    from gsv_tpu.protocol.garbled_groth16 import ProofBits

    if "--tpu" in sys.argv:
        from gsv_tpu.core.jitcache import enable_if_tpu

        enable_if_tpu()
    else:
        from gsv_tpu.core.jitcache import enable_cpu

        enable_cpu()  # same-machine CPU cache: restarts skip the compiles

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    B = int(args[0]) if args else 2
    path = args[1] if len(args) > 1 else ".gplan_k6_uniform_1048576.pkl"

    vk, proof, publics = dummy_proof(k=6, seed=0)
    assert verify(vk, proof, publics)
    pb = ProofBits.encode(
        [int(x) for x in publics], proof.a, proof.b, proof.c, compressed=False
    )
    good = np.array([int(b) for b in pb.bits], dtype=np.uint8)

    t0 = time.time()
    with open(path, "rb") as fh:
        gplan = pickle.load(fh)
    print(
        f"gplan loaded in {time.time()-t0:.0f}s: {gplan.total_gates:,} gates, "
        f"{gplan.n_dispatches:,} dispatches",
        flush=True,
    )
    assert len(good) == gplan.n_inputs

    batch = B if B > 1 else None
    rngs = [GarblerRng(1 + i) for i in range(B)]
    bits = np.stack([good.copy() for _ in range(B)])
    expect = [True] * B
    if B >= 2:
        bits[1][0] ^= 1  # corrupted proof bit -> must NOT verify
        expect[1] = False
    l0 = np.stack(
        [words_from_int_array([r.issue_label0() for r in rngs])
         for _ in range(gplan.n_inputs)],
        axis=1,
    )
    delta = words_from_int_array([r.delta for r in rngs])
    f0 = words_from_int_array([r.false_label0 for r in rngs])
    t0s = words_from_int_array([r.true_label0 for r in rngs])
    if batch is None:
        l0, bits, delta, f0, t0s = l0[0], bits[0], delta[0], f0[0], t0s[0]

    ex = GroupExecutor(gplan, batch=batch)
    t0 = time.time()
    res = ex.garble_evaluate_2pc(l0, bits, delta, f0, t0s)
    dt = time.time() - t0
    gates = gplan.total_gates * B
    print(f"2PC roundtrip: {dt:.1f}s ({gates/dt/1e6:.1f} Mgates/s incl. both sides)",
          flush=True)

    assert (res["garble_digest"] == res["evaluate_digest"]).all(), "stream hash mismatch"
    out_bits = np.asarray(res["out_bits"]).reshape(B, -1)
    out_active = np.asarray(res["out_active"]).reshape(B, -1, 4)
    out_l0 = np.asarray(res["out_label0"]).reshape(B, -1, 4)
    for i in range(B):
        got = bool(out_bits[i][0])
        print(f"instance {i}: verification_result={got} (expect {expect[i]})",
              flush=True)
        assert got == expect[i]
        la = int_array_from_words(out_active[i])[0]
        w0 = int_array_from_words(out_l0[i])[0]
        assert la == (w0 ^ (rngs[i].delta if got else 0)), "active-label invariant"
    print("2PC ROUNDTRIP PASSED: digests match, valid proof verifies, "
          "corrupted proof rejected, active labels consistent", flush=True)
    print(json.dumps({
        "metric": "full_groth16_2pc_gates_per_s",
        "value": gates / dt,
        "unit": "gates/s (garble+evaluate)",
        "vs_baseline": (gates / dt) / 249e6,
    }), flush=True)


if __name__ == "__main__":
    main()
