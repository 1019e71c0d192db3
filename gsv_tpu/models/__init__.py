"""Flagship circuit programs ("models") built on the gadget library.

The framework's models are circuits: the Groth16 verifier families
(uncompressed / compressed 2PC variants) plus the sub-circuit families used
for benchmarking and testing (field tower ops, MSM, pairing).
"""

from gsv_tpu.models.groth16_verifier import (  # noqa: F401
    Groth16VerifierModel,
    fq12_mul_model,
    fq_mul_model,
)
