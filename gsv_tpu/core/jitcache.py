"""Persistent XLA compilation cache, TPU-only.

Compilation here goes through a remote service at ~40s per program
(serialized), so caching compiled executables across processes/rounds is a
huge win: the full Groth16 verifier plan has ~970 distinct shape signatures
(~11h of compiles cold).  The cache is enabled ONLY when the backend is a
TPU — CPU AOT artifacts embed host machine features and poison runs when
they cross machines (observed: ``+prefer-no-scatter`` feature mismatch), so
the CPU path stays per-process.

The cache lives inside the repo (``.jit_cache/``, gitignored) so it
survives across build rounds on this machine.
"""

from __future__ import annotations

import os

CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".jit_cache")


def enable_if_tpu() -> bool:
    """Turn on the persistent compilation cache when running on TPU."""
    import jax

    try:
        on_tpu = any(
            d.platform.startswith(("tpu", "axon")) for d in jax.devices()
        )
    except Exception:  # no backend
        return False
    if not on_tpu:
        return False
    try:
        os.makedirs(CACHE_DIR, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return True
    except Exception:
        return False
