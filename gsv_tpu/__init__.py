"""gsv_tpu — a TPU-native streaming garbled-circuit framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
BitVM/garbled-snark-verifier (a Rust half-gates garbled-circuit runtime that
evaluates a Groth16 verifier over BN254 as an ~11.17B-gate boolean circuit):

- ``gsv_tpu.core``      — 128-bit labels, gate types / half-gates alpha tables,
                          bit-exact ChaCha20 label RNG (reference: ``src/core/``).
- ``gsv_tpu.ops``       — crypto kernels: fixed-key AES-128 tweakable hash
                          (host oracle + bitsliced JAX + Pallas TPU kernels),
                          BLAKE3, accumulating ciphertext hash
                          (reference: ``src/hashers/``, ``src/ciphertext_hasher.rs``).
- ``gsv_tpu.circuit``   — circuit tracer producing static gate tapes with
                          topological wave schedules and linear-scan slot
                          allocation; Execute / Garble / Evaluate modes
                          (reference: ``src/circuit/``, ``src/storage.rs``).
- ``gsv_tpu.gadgets``   — gadget library: basic cells, u254 bigint, BN254
                          field tower, curve ops, pairing, Groth16 verifier
                          (reference: ``src/gadgets/``).
- ``gsv_tpu.bn254_host``— host-side BN254 + Groth16 implementation used for
                          verifying-key preprocessing and as the test oracle
                          (replaces the reference's arkworks dependency).
- ``gsv_tpu.protocol``  — 2PC encodings and the cut-and-choose protocol
                          (reference: ``src/garbled_groth16.rs``, ``src/cut_and_choose/``).
- ``gsv_tpu.parallel``  — instance batching and device-mesh sharding.
- ``gsv_tpu.native``    — C++ host runtime (AES-NI, ChaCha20, stream spooling).

Unlike the reference — which interprets gates one at a time behind pointer
chasing (slab storage + LRU template cache) — this framework compiles each
distinct circuit component once into a static numpy "tape" (gate arrays,
wave schedule, slot assignment) and executes the tape on TPU as dense
vectorized label algebra: free gates are XORs over ``(wave, 4)`` uint32 label
arrays and AND-variants are bitsliced fixed-key AES over gate waves.
"""

__version__ = "0.1.0"

# NOTE on this environment's tunneled TPU: kernel compilation happens via the
# plugin's remote-compile service (PALLAS_AXON_REMOTE_COMPILE=1, the preset).
# Do NOT switch to local compilation — the terminal rejects AOT executables
# built with a mismatched local libtpu.  Tape programs are kept small (gate
# arrays are passed as runtime arguments, not HLO constants) so they stay
# under the remote-compile request-size limit.
