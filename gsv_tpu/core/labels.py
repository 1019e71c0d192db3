"""128-bit garbled labels ("S" in the reference, ``src/core/s.rs``).

Host-side representation: plain Python ``int`` in ``[0, 2**128)``.
Array representation (device + bulk host work): ``uint32`` arrays of shape
``(..., 4)`` in **big-endian word order** — ``words[..., 0]`` holds bits
127..96 and ``words[..., 3]`` holds bits 31..0.  With this layout the
concatenated big-endian bytes of the four words equal the reference's
``S::to_bytes`` (``u128::to_be_bytes``, ``src/core/s.rs:30-32``), which is the
byte order fed to the AES hasher and written to ciphertext streams.

XOR (the free-gate operation and Free-XOR label algebra) is elementwise
``^`` in either representation.
"""

from __future__ import annotations

import numpy as np

MASK128 = (1 << 128) - 1
MASK64 = (1 << 64) - 1

# ------------------------------------------------------------------
# Scalar (Python int) helpers
# ------------------------------------------------------------------


def s_from_bytes(b: bytes) -> int:
    """Big-endian bytes -> label int (``S::from_bytes``)."""
    if len(b) != 16:
        raise ValueError(f"label must be 16 bytes, got {len(b)}")
    return int.from_bytes(b, "big")


def s_to_bytes(s: int) -> bytes:
    """Label int -> big-endian bytes (``S::to_bytes``)."""
    return (s & MASK128).to_bytes(16, "big")


def s_to_hex(s: int) -> str:
    return s_to_bytes(s).hex()


def s_neg(s: int) -> int:
    """Two's-complement negation mod 2**128 (``S::neg``)."""
    return (-s) & MASK128


# ------------------------------------------------------------------
# Word-array helpers (numpy; the same layout is used by jnp kernels)
# ------------------------------------------------------------------


def words_from_int(s: int) -> np.ndarray:
    """Label int -> ``(4,)`` uint32, big-endian word order."""
    s &= MASK128
    return np.array(
        [(s >> 96) & 0xFFFFFFFF, (s >> 64) & 0xFFFFFFFF, (s >> 32) & 0xFFFFFFFF, s & 0xFFFFFFFF],
        dtype=np.uint32,
    )


def int_from_words(w) -> int:
    w = np.asarray(w, dtype=np.uint32)
    if w.shape != (4,):
        raise ValueError(f"expected shape (4,), got {w.shape}")
    return (int(w[0]) << 96) | (int(w[1]) << 64) | (int(w[2]) << 32) | int(w[3])


def words_from_int_array(vals) -> np.ndarray:
    """Iterable of label ints -> ``(n, 4)`` uint32 array."""
    vals = list(vals)
    out = np.empty((len(vals), 4), dtype=np.uint32)
    for i, s in enumerate(vals):
        s &= MASK128
        out[i, 0] = (s >> 96) & 0xFFFFFFFF
        out[i, 1] = (s >> 64) & 0xFFFFFFFF
        out[i, 2] = (s >> 32) & 0xFFFFFFFF
        out[i, 3] = s & 0xFFFFFFFF
    return out


def int_array_from_words(w) -> list[int]:
    """``(n, 4)`` uint32 array -> list of label ints."""
    w = np.asarray(w, dtype=np.uint32)
    if w.ndim != 2 or w.shape[1] != 4:
        raise ValueError(f"expected shape (n, 4), got {w.shape}")
    return [
        (int(r[0]) << 96) | (int(r[1]) << 64) | (int(r[2]) << 32) | int(r[3]) for r in w
    ]


def words_to_bytes(w) -> bytes:
    """``(..., 4)`` uint32 words -> concatenated 16-byte big-endian blocks."""
    w = np.asarray(w, dtype=np.uint32)
    return w.astype(">u4").tobytes()


def words_from_buffer(b: bytes) -> np.ndarray:
    """Concatenated 16-byte big-endian blocks -> ``(n, 4)`` uint32 words."""
    if len(b) % 16 != 0:
        raise ValueError("buffer length must be a multiple of 16")
    return np.frombuffer(b, dtype=">u4").astype(np.uint32).reshape(-1, 4)
