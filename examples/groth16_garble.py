"""Full 2PC garble -> stream -> evaluate demo on a sub-circuit
(reference: examples/groth16_garble.rs, scaled to the Fq12-mul workload so
it completes quickly on CPU).  The FULL 10.76B-gate verifier version of
this flow is examples/groth16_2pc_roundtrip.py (group-locked, ciphertexts
consumed on device); examples/bench_groth16_garble_group.py benches it.  --hasher picks aes|blake3 like the reference
CLI (groth16_garble.rs:276-293).

Pass 1: garble with an accumulating AES hash commitment.
Pass 2: re-garble streaming ciphertexts to the evaluator (with a hash tee),
evaluate with the evaluator's chosen inputs, check output labels and the
ciphertext-stream hash match.
"""

import argparse
import random
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from gsv_tpu.circuit.ciphertext import ArraySource, CollectHandler, HashHandler, TeeHandler
from gsv_tpu.circuit.streaming import EvaluatedWire
from gsv_tpu.models.groth16_verifier import fq12_mul_model


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--hasher", choices=("aes", "blake3"), default="aes")
    args = ap.parse_args()

    runner = fq12_mul_model()
    print(f"circuit: {runner.template.total_gates:,} gates")

    # pass 1: garble with hash commitment only
    t0 = time.time()
    h1 = HashHandler()
    res1 = runner.garble(args.seed, ct_handler=h1, hasher=args.hasher)
    commit = h1.finalize()
    print(f"pass 1 (garble+commit) in {time.time() - t0:.0f}s; commit={commit.hex()}")

    # pass 2: re-garble from the same seed, stream ciphertexts + tee hash
    col, h2 = CollectHandler(), HashHandler()
    res2 = runner.garble(args.seed, ct_handler=TeeHandler(col, h2), hasher=args.hasher)
    assert h2.finalize() == commit, "re-garble hash mismatch"

    # evaluator side: random input bits select active labels
    rng = random.Random(7)
    bits = [bool(rng.getrandbits(1)) for _ in range(runner.n_inputs)]
    inputs = [
        EvaluatedWire(gw.select(b), b)
        for gw, b in zip(res2.input_wire_values, bits)
    ]
    t0 = time.time()
    eres = runner.evaluate(
        inputs,
        true_label=res2.true_wire_constant.label1,
        false_label=res2.false_wire_constant.label0,
        ct_source=ArraySource(col.stream()),
        hasher=args.hasher,
    )
    print(f"evaluated in {time.time() - t0:.0f}s")

    # output labels must be the garbler's selected labels
    for ew, gw in zip(eres.output_value, res2.output_value):
        assert ew.active_label == gw.select(ew.value), "output label mismatch!"
    print("output labels consistent with garbler pairs; 2PC roundtrip OK")


if __name__ == "__main__":
    main()
