"""Garbled Groth16: 2PC input encodings for garbler and evaluator.

Reference parity: ``src/garbled_groth16.rs`` —

- Garbler side: allocates the verifier circuit with *affine* proof points
  (z coordinates are constants) and encodes **fresh random labels** per input
  wire in allocation order (garbled_groth16.rs:93-183); it never sees the
  proof.
- Evaluator side: selects active labels from the garbler's label pairs using
  its semantic bits — public scalars as raw bits, curve coordinates in
  Montgomery form, compression flags via the circuit's canonical sqrt
  convention (garbled_groth16.rs:213-416, 418-723).

Input allocation order (must match label-draw order): public scalars, then
A, B, C.  Uncompressed: a.x, a.y | b.x (c0, c1), b.y (c0, c1) | c.x, c.y.
Compressed: a.x, a.y_flag | b.x (c0, c1), b.y_flag | c.x, c.y_flag.
"""

from __future__ import annotations

from dataclasses import dataclass

from gsv_tpu.bn254_host.curve import G1, G2
from gsv_tpu.bn254_host.field import Fq as HostFq, Fq2 as HostFq2, P
from gsv_tpu.bn254_host.groth16 import Proof, VerifyingKey
from gsv_tpu.circuit.streaming import EvaluatedWire, GarbledWire
from gsv_tpu.gadgets import bigint
from gsv_tpu.gadgets.bn254.fq import FqWire
from gsv_tpu.gadgets.bn254.fq2 import Fq2Wire
from gsv_tpu.gadgets.bn254.g1 import FrScalarWire, G1Wire
from gsv_tpu.gadgets.bn254.g2 import G2Wire
from gsv_tpu.gadgets.groth16 import (
    CompressedG1Wires,
    CompressedG2Wires,
    groth16_verify,
    groth16_verify_compressed,
)

N_BITS = 254


def n_input_wires(n_public: int, compressed: bool) -> int:
    if compressed:
        return n_public * N_BITS + (N_BITS + 1) + (2 * N_BITS + 1) + (N_BITS + 1)
    return n_public * N_BITS + 2 * N_BITS + 4 * N_BITS + 2 * N_BITS


def build_2pc_circuit(vk: VerifyingKey, n_public: int, compressed: bool):
    """Circuit over affine proof inputs (z constants), matching the 2PC
    allocation of ``GarblerInput::allocate`` (garbled_groth16.rs:105-137)."""
    n_inputs = n_input_wires(n_public, compressed)

    def circuit(ctx, wires):
        pos = 0

        def take(n):
            nonlocal pos
            seg = wires[pos : pos + n]
            pos += n
            return seg

        public = [FrScalarWire(bigint.BigIntWires(take(N_BITS))) for _ in range(n_public)]
        if compressed:
            a = CompressedG1Wires(FqWire(bigint.BigIntWires(take(N_BITS))), take(1)[0])
            b = CompressedG2Wires(
                Fq2Wire(
                    FqWire(bigint.BigIntWires(take(N_BITS))),
                    FqWire(bigint.BigIntWires(take(N_BITS))),
                ),
                take(1)[0],
            )
            c = CompressedG1Wires(FqWire(bigint.BigIntWires(take(N_BITS))), take(1)[0])
            assert pos == n_inputs
            return [groth16_verify_compressed(ctx, public, a, b, c, vk)]
        one = FqWire.new_constant(1)
        zero = FqWire.new_constant(0)
        a = G1Wire(
            FqWire(bigint.BigIntWires(take(N_BITS))),
            FqWire(bigint.BigIntWires(take(N_BITS))),
            one,
        )
        b = G2Wire(
            Fq2Wire(
                FqWire(bigint.BigIntWires(take(N_BITS))),
                FqWire(bigint.BigIntWires(take(N_BITS))),
            ),
            Fq2Wire(
                FqWire(bigint.BigIntWires(take(N_BITS))),
                FqWire(bigint.BigIntWires(take(N_BITS))),
            ),
            Fq2Wire(one, zero),
        )
        c = G1Wire(
            FqWire(bigint.BigIntWires(take(N_BITS))),
            FqWire(bigint.BigIntWires(take(N_BITS))),
            one,
        )
        assert pos == n_inputs
        return [groth16_verify(ctx, public, a, b, c, vk)]

    return circuit, n_inputs


# ----------------------------------------------------------------------
# Semantic bit encodings (evaluator side)
# ----------------------------------------------------------------------


def _bits(v: int, n: int = N_BITS) -> list[bool]:
    return [bool((v >> i) & 1) for i in range(n)]


def fq_canonical_sqrt(a: HostFq) -> HostFq:
    """The circuit's sqrt: a^((p+1)/4) (may not square to a)."""
    return a.pow((P + 1) // 4)


def fq2_canonical_sqrt(a: HostFq2) -> HostFq2:
    """Mirror of ``sqrt_general_montgomery`` (fq2.rs:425-447) on the host."""
    alpha = a.c0 * a.c0 + a.c1 * a.c1
    alpha_sqrt = fq_canonical_sqrt(alpha)
    delta = (alpha_sqrt + a.c0) * HostFq(2).inv()
    if delta.legendre() == -1:
        delta = delta - alpha_sqrt
    c0 = fq_canonical_sqrt(delta)
    c1 = a.c1 * (c0 + c0).inv()
    return HostFq2(c0, c1)


@dataclass
class ProofBits:
    """Semantic input bits in allocation order (evaluator's selection)."""

    bits: list[bool]

    @classmethod
    def encode(
        cls,
        public: list[int],
        proof_a: G1,
        proof_b: G2,
        proof_c: G1,
        compressed: bool,
    ) -> "ProofBits":
        bits: list[bool] = []
        for s in public:
            bits += _bits(int(s))
        if compressed:
            a_flag = fq_canonical_sqrt(proof_a.y * proof_a.y) == proof_a.y
            b_flag = fq2_canonical_sqrt(proof_b.y.square()) == proof_b.y
            c_flag = fq_canonical_sqrt(proof_c.y * proof_c.y) == proof_c.y
            bits += _bits(FqWire.as_montgomery(int(proof_a.x)))
            bits.append(a_flag)
            bits += _bits(FqWire.as_montgomery(int(proof_b.x.c0)))
            bits += _bits(FqWire.as_montgomery(int(proof_b.x.c1)))
            bits.append(b_flag)
            bits += _bits(FqWire.as_montgomery(int(proof_c.x)))
            bits.append(c_flag)
        else:
            bits += _bits(FqWire.as_montgomery(int(proof_a.x)))
            bits += _bits(FqWire.as_montgomery(int(proof_a.y)))
            bits += _bits(FqWire.as_montgomery(int(proof_b.x.c0)))
            bits += _bits(FqWire.as_montgomery(int(proof_b.x.c1)))
            bits += _bits(FqWire.as_montgomery(int(proof_b.y.c0)))
            bits += _bits(FqWire.as_montgomery(int(proof_b.y.c1)))
            bits += _bits(FqWire.as_montgomery(int(proof_c.x)))
            bits += _bits(FqWire.as_montgomery(int(proof_c.y)))
        return cls(bits)


def select_active_labels(
    label_pairs: list[GarbledWire], proof_bits: ProofBits
) -> list[EvaluatedWire]:
    """Evaluator's input: active label per wire chosen by its semantic bit
    (``EvaluatedWire::new_from_garbled``)."""
    assert len(label_pairs) == len(proof_bits.bits)
    return [
        EvaluatedWire(gw.select(b), b) for gw, b in zip(label_pairs, proof_bits.bits)
    ]
