"""Bit-level packing utilities for bitsliced kernels.

``transpose32`` is the classic masked-swap 32x32 bit-matrix transpose
(5 stages of shift/xor/mask), vectorized over leading axes.  It converts
between "block-major" uint32 words (one word per AES block) and "plane-major"
words (one bit per block, 32 blocks per word) — the layout conversion at the
edge of every bitsliced AES call.

Works with either numpy or jax.numpy via the ``xp`` parameter.

Convention: for input ``x`` of shape (..., 32), output ``y`` satisfies
``bit i of y[..., t] == bit t of x[..., i]`` (verified in tests) — i.e. plane
``t`` packs bit ``t`` of each of the 32 input words, with word ``i``'s bit
landing at bit position ``i``.
"""

from __future__ import annotations

import numpy as np

_STAGES = (
    (16, 0x0000FFFF),
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _transpose32_msb(x, xp=np):
    """Hacker's Delight orientation: bit i of y[t] == bit (31-t) of x[31-i]."""
    y = x
    shape = x.shape[:-1]
    for j, m in _STAGES:
        mask = xp.uint32(m)
        g = 32 // (2 * j)
        yr = y.reshape(shape + (g, 2, j))
        a = yr[..., 0, :]
        b = yr[..., 1, :]
        t = (a ^ (b >> xp.uint32(j))) & mask
        a = a ^ t
        b = b ^ (t << xp.uint32(j))
        y = xp.stack([a, b], axis=-2).reshape(shape + (32,))
    return y


def transpose32(x, xp=np):
    """(..., 32) uint32 -> (..., 32) uint32 bit-matrix transpose.

    Output satisfies: bit i of y[..., t] == bit t of x[..., i].
    """
    return _transpose32_msb(x[..., ::-1], xp=xp)[..., ::-1]


def pack_bits_u32(bits, xp=np):
    """(..., 32) of 0/1 uint32 -> (...,) uint32 with bit i = bits[..., i]."""
    weights = (xp.uint32(1) << xp.arange(32, dtype=xp.uint32)).reshape(
        (1,) * (bits.ndim - 1) + (32,)
    )
    return (bits.astype(xp.uint32) * weights).sum(axis=-1).astype(xp.uint32)


def unpack_bits_u32(words, xp=np):
    """(...,) uint32 -> (..., 32) of 0/1 uint32."""
    shifts = xp.arange(32, dtype=xp.uint32).reshape((1,) * words.ndim + (32,))
    return (words[..., None] >> shifts) & xp.uint32(1)
