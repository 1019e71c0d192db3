"""Host-side BN254 + Groth16 (pure Python).

Replaces the reference's arkworks dependency (``ark-bn254``, ``ark-groth16``
— SURVEY appendix): host-side field/curve/pairing math for verifying-key
preprocessing, input encoding, and as the oracle the circuit gadgets are
tested against.  Formula-compatible with arkworks (same tower, same twist
constants, same ate loop), so the circuit gadgets mirror
``src/gadgets/bn254/pairing.rs`` exactly.
"""

from gsv_tpu.bn254_host.field import Fq, Fq2, Fq6, Fq12, Fr, P, R  # noqa: F401
from gsv_tpu.bn254_host.curve import G1, G2, g1_gen, g2_gen  # noqa: F401
from gsv_tpu.bn254_host.pairing import (  # noqa: F401
    ate_loop_count,
    ell_coeffs,
    final_exponentiation,
    miller_loop,
    multi_miller_loop,
    pairing,
)
