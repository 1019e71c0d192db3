"""Execute-mode Groth16 verifier run (reference: examples/groth16_mpc.rs).

Host setup/prove -> trace the verifier circuit -> boolean execution ->
prints the verification result and gate counts.

Usage: python examples/groth16_mpc.py [k]
(k = log2 constraint count of the fixture; circuit size is k-independent)
"""

import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from gsv_tpu.bn254_host.curve import G1Jac, G2Jac
from gsv_tpu.bn254_host.groth16 import dummy_proof, verify
from gsv_tpu.circuit import trace_circuit
from gsv_tpu.circuit.link import link
from gsv_tpu.circuit.runtime import PlanExecutor
from gsv_tpu.circuit.tape import Compiler
from gsv_tpu.core.gate_types import GateCount
from gsv_tpu.gadgets.groth16 import Groth16Input, build_verify_circuit


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    vk, proof, publics = dummy_proof(k=k, seed=0)
    assert verify(vk, proof, publics)

    fn, n_inputs = build_verify_circuit(vk, n_public=len(publics))
    t0 = time.time()
    tmpl, _ = trace_circuit(fn, n_inputs)
    gc = GateCount(tmpl.hist)
    print(f"traced in {time.time() - t0:.0f}s")
    print(f"gate counts: total={gc.total:,} nonfree={gc.nonfree:,} free={gc.free:,}")

    t0 = time.time()
    plan = link(Compiler().compile(tmpl), n_inputs)
    print(f"compiled in {time.time() - t0:.0f}s")

    inp = Groth16Input(
        public=[int(x) for x in publics],
        a=G1Jac.from_affine(proof.a),
        b=G2Jac.from_affine(proof.b),
        c=G1Jac.from_affine(proof.c),
    )
    ex = PlanExecutor(plan)
    bits = np.array([int(b) for b in inp.to_bits()], dtype=np.uint8)
    t0 = time.time()
    out = ex.execute(bits)
    dt = time.time() - t0
    print(f"executed in {dt:.0f}s ({gc.total / dt / 1e6:.1f} Mgates/s)")
    print(f"verification_result: {bool(out[0])}")
    if "--check" in sys.argv:
        assert bool(out[0]), "valid proof must verify"
        # corrupt one bit of the proof encoding -> must NOT verify
        # (reference: run_false_bitflip_test, gadgets/groth16.rs:510-539)
        bad = bits.copy()
        bad[0] ^= 1
        t0 = time.time()
        out_bad = ex.execute(bad)
        print(
            f"corrupted-proof result: {bool(out_bad[0])} "
            f"({time.time() - t0:.0f}s)"
        )
        assert not bool(out_bad[0]), "corrupted proof must fail"
        print("CHECK PASSED: valid proof verifies, corrupted proof rejected")


if __name__ == "__main__":
    main()
