"""Runtime hardware/capability detection.

Reference parity: ``src/hw.rs:4-46`` — the reference probes for x86/aarch64
AES instructions and warns when the software fallback will run.  The TPU
analogue probes which JAX backend will execute the bitsliced AES gate hash
(TPU vs CPU fallback) and whether the host has a fast AES for the
host-side oracle/commitment paths (OpenSSL via ``cryptography``).
"""

from __future__ import annotations

import functools
import logging

logger = logging.getLogger("gsv_tpu")


@functools.cache
def tpu_available() -> bool:
    """True when JAX will run device kernels on a TPU."""
    try:
        import jax

        return any(d.platform.startswith(("tpu", "axon")) for d in jax.devices())
    except Exception:  # noqa: BLE001 — no backend at all
        return False


@functools.cache
def host_aes_available() -> bool:
    """True when the host AES oracle uses OpenSSL rather than pure Python."""
    try:
        from cryptography.hazmat.primitives.ciphers import Cipher  # noqa: F401

        return True
    except ImportError:
        return False


@functools.cache
def check_hashing_backend() -> str:
    """Log (once) which backends the gate hash will use; returns a summary.

    Mirrors the reference's startup warning when hardware AES is absent
    (``src/hw.rs:30-46``).
    """
    dev = "tpu" if tpu_available() else "cpu"
    host = "openssl" if host_aes_available() else "pure-python"
    if dev == "cpu":
        logger.warning(
            "no TPU detected: bitsliced AES gate hashing will run on XLA:CPU "
            "(correct but far from speed-of-light)"
        )
    if host == "pure-python":
        logger.warning(
            "cryptography/OpenSSL unavailable: host-side AES oracle falls "
            "back to pure Python (slow; device path unaffected)"
        )
    summary = f"device={dev} host_aes={host}"
    logger.info("hashing backends: %s", summary)
    return summary
