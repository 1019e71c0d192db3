"""Persistent XLA compilation cache.

TPU: compilation goes through a remote service at ~40s per program
(serialized), so caching compiled executables across processes/rounds is a
huge win: the full Groth16 verifier plan has ~970 distinct shape signatures
(~11h of compiles cold; ~82 as the grouped plan).

CPU: artifacts embed host machine features and poison runs when they cross
MACHINES (observed: ``+prefer-no-scatter`` feature mismatch), but a
same-machine cache is safe and makes the multi-hour flagship-scale CPU
validations (2PC roundtrip, full cut-and-choose) restartable — kept in a
separate directory so the two artifact families never mix.

Both caches live inside the repo (gitignored) so they survive across build
rounds on this machine.
"""

from __future__ import annotations

import os

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
CACHE_DIR = os.path.join(_ROOT, ".jit_cache")
CPU_CACHE_DIR = os.path.join(_ROOT, ".jit_cache_cpu")


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


def _host_sig() -> str:
    """CPU-feature fingerprint: XLA:CPU artifacts embed host features, so a
    committed cache must refuse to load on a different machine type."""
    import hashlib
    import platform

    flags = ""
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith(("flags", "Features")):
                    flags = line
                    break
    except Exception:
        pass
    return hashlib.sha256((platform.machine() + flags).encode()).hexdigest()[:16]


def enable_cpu() -> bool:
    """Same-machine persistent cache for the XLA:CPU backend.

    Safe to commit to git: a host-signature stamp (``HOST.json``) is
    checked first, and on any other machine type the cache is simply not
    enabled (cold compiles, no poisoning) — the observed cross-machine
    failure mode was a hard ``+prefer-no-scatter`` feature mismatch."""
    import json

    import jax

    try:
        if jax.default_backend() != "cpu":
            return False
        os.makedirs(CPU_CACHE_DIR, exist_ok=True)
        stamp = os.path.join(CPU_CACHE_DIR, "HOST.json")
        sig = _host_sig()
        if os.path.exists(stamp):
            with open(stamp) as fh:
                if json.load(fh).get("host_sig") != sig:
                    return False  # foreign machine: leave the cache alone
        else:
            with open(stamp, "w") as fh:
                json.dump({"host_sig": sig}, fh)
        jax.config.update("jax_compilation_cache_dir", CPU_CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        return True
    except Exception:
        return False
