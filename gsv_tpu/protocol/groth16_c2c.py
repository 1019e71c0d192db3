"""Groth16-specialized cut-and-choose (reference: src/cut_and_choose/groth16.rs).

Binds the cut-and-choose machinery to the compressed Groth16 verifier
circuit: a garbler that batches full verifier instances, and
``prepare_input_labels`` mapping (public inputs, proof) onto the garbler's
label pairs for the evaluator (groth16.rs:71-110).
"""

from __future__ import annotations

from dataclasses import dataclass

from gsv_tpu.bn254_host.groth16 import Proof, VerifyingKey
from gsv_tpu.circuit.streaming import EvaluatedWire
from gsv_tpu.models.groth16_verifier import Groth16VerifierModel
from gsv_tpu.protocol.cut_and_choose import Config, Evaluator, Garbler
from gsv_tpu.protocol.garbled_groth16 import ProofBits, select_active_labels

# The reference reserves 150_000 live-wire slots for the Groth16 circuit
# (cut_and_choose/groth16.rs:17); here the analogous capacity is the plan's
# statically-computed arena size — no knob needed.


@dataclass
class Groth16CutAndChoose:
    """Convenience binding: verifier model + protocol objects."""

    vk: VerifyingKey
    n_public: int
    total: int
    to_finalize: int
    compressed: bool = True

    def __post_init__(self):
        self.model = Groth16VerifierModel(
            vk=self.vk, n_public=self.n_public, compressed=self.compressed
        )
        self.config = Config(total=self.total, to_finalize=self.to_finalize)

    def garbler(self, seeds: list[int] | None = None) -> Garbler:
        return Garbler(self.model.runner, self.config, seeds=seeds)

    def evaluator(self, rng, commits) -> Evaluator:
        return Evaluator(rng, self.config, commits)

    def prepare_input_labels(
        self, garbler: Garbler, index: int, public: list[int], proof: Proof
    ) -> list[EvaluatedWire]:
        """Evaluator-side input: active labels selected by the proof bits
        (cut_and_choose/groth16.rs:71-110 + garbled_groth16 EvaluatorInput)."""
        bits = ProofBits.encode(
            public, proof.a, proof.b, proof.c, compressed=self.compressed
        )
        return select_active_labels(garbler.instances[index].input_labels, bits)
