"""Core types: labels, gate types, RNG, progress logging.

Reference parity: ``src/core/`` (s.rs, delta.rs, wire.rs, gate.rs,
gate_type.rs, progress.rs).
"""

from gsv_tpu.core.gate_types import (  # noqa: F401
    GateType,
    GateCount,
    ALPHA_A,
    ALPHA_B,
    ALPHA_C,
    FREE_MASK,
    gate_fn,
    truth_table,
    alphas,
    N_GATE_TYPES,
)
from gsv_tpu.core.labels import (  # noqa: F401
    MASK128,
    s_from_bytes,
    s_to_bytes,
    s_to_hex,
    s_neg,
    words_from_int,
    int_from_words,
    words_from_int_array,
    int_array_from_words,
)
from gsv_tpu.core.rng import ChaCha20Rng, GarblerRng  # noqa: F401
