"""Execute-mode COMPRESSED Groth16 verifier run (VERDICT round-1 missing #5).

Mirrors the reference's in-circuit validation of the compressed path
(reference: src/gadgets/groth16.rs:826-860 decompression roundtrips and the
``verify_compressed`` binding used by the cut-and-choose example,
examples/groth16_cut_and_choose.rs:83-119): trace the compressed verifier
(in-circuit G1/G2 decompression + sqrt), execute with a valid proof (expect
True), then with one corrupted input bit (expect False).

Usage: python examples/groth16_mpc_compressed.py [k] [--check]
"""

import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from gsv_tpu.bn254_host.groth16 import dummy_proof, verify
from gsv_tpu.circuit import trace_circuit
from gsv_tpu.circuit.link import link
from gsv_tpu.circuit.runtime import PlanExecutor
from gsv_tpu.circuit.tape import Compiler
from gsv_tpu.core.gate_types import GateCount
from gsv_tpu.protocol.garbled_groth16 import ProofBits, build_2pc_circuit


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    vk, proof, publics = dummy_proof(k=k, seed=0)
    assert verify(vk, proof, publics)

    fn, n_inputs = build_2pc_circuit(vk, n_public=len(publics), compressed=True)
    t0 = time.time()
    tmpl, _ = trace_circuit(fn, n_inputs)
    gc = GateCount(tmpl.hist)
    print(f"traced in {time.time() - t0:.0f}s", flush=True)
    print(f"gate counts: total={gc.total:,} nonfree={gc.nonfree:,} free={gc.free:,}", flush=True)

    t0 = time.time()
    plan = link(Compiler().compile(tmpl), n_inputs)
    print(f"compiled+linked in {time.time() - t0:.0f}s", flush=True)

    pb = ProofBits.encode(
        [int(x) for x in publics], proof.a, proof.b, proof.c, compressed=True
    )
    bits = np.array([int(b) for b in pb.bits], dtype=np.uint8)
    ex = PlanExecutor(plan)
    t0 = time.time()
    out = ex.execute(bits)
    dt = time.time() - t0
    print(f"executed in {dt:.0f}s ({gc.total / dt / 1e6:.1f} Mgates/s)", flush=True)
    ok = bool(out[0])
    print(f"verification_result: {ok}", flush=True)
    assert ok, "valid compressed proof must verify"

    if "--check" in sys.argv:
        # corrupt one bit of proof_a.x (first proof wire after the publics)
        bad = bits.copy()
        flip = 254 * len(publics) + 17
        bad[flip] ^= 1
        t0 = time.time()
        out_bad = ex.execute(bad)
        print(f"corrupted run in {time.time() - t0:.0f}s", flush=True)
        rejected = not bool(out_bad[0])
        print(f"corrupted_bit_rejected: {rejected}", flush=True)
        assert rejected, "corrupted compressed proof must be rejected"
        print("COMPRESSED CHECK PASSED", flush=True)


if __name__ == "__main__":
    main()
