"""Vectorized BLAKE3 gate hash (numpy / jax.numpy).

Reference parity: ``Blake3Hasher::hash_with_gate`` (src/hashers/mod.rs:36-51)
— ``H(label_be_bytes || gate_id_le_bytes)`` truncated to 16 bytes.  The
24-byte input is a single chunk / single block, so the whole hash is one
compression call with flags CHUNK_START|CHUNK_END|ROOT, block_len 24,
counter 0.

Unlike AES, BLAKE3 is word-oriented (32-bit adds/rotates/xors), so it
vectorizes over a gate wave directly — state is (16, n) uint32 lanes, no
bitslicing needed.
"""

from __future__ import annotations

import numpy as np

from gsv_tpu.ops.blake3_host import CHUNK_END, CHUNK_START, IV, MSG_PERMUTATION, ROOT

_FLAGS = CHUNK_START | CHUNK_END | ROOT
_BLOCK_LEN = 24


def _bswap32(x, xp):
    return (
        ((x & xp.uint32(0xFF)) << xp.uint32(24))
        | ((x & xp.uint32(0xFF00)) << xp.uint32(8))
        | ((x >> xp.uint32(8)) & xp.uint32(0xFF00))
        | (x >> xp.uint32(24))
    )


def _rotr(x, n, xp):
    return ((x >> xp.uint32(n)) | (x << xp.uint32(32 - n))) & xp.uint32(0xFFFFFFFF)


def blake3_hash_words(labels, gid_hi, gid_lo, xp=np):
    """Gate hash for a wave: labels (n, 4) BE-word uint32, gids (n,) uint32
    pairs -> (n, 4) BE-word uint32 outputs (first 16 bytes of the hash)."""
    n = labels.shape[0]
    zeros = xp.zeros((n,), dtype=xp.uint32)
    # message words: LE u32 over (label_be_bytes || gid_le_bytes || 0-pad)
    m = [
        _bswap32(labels[:, 0], xp),
        _bswap32(labels[:, 1], xp),
        _bswap32(labels[:, 2], xp),
        _bswap32(labels[:, 3], xp),
        gid_lo.astype(xp.uint32),
        gid_hi.astype(xp.uint32),
    ] + [zeros] * 10

    iv = [xp.full((n,), xp.uint32(v)) for v in IV]
    state = iv[:8] + [
        xp.full((n,), xp.uint32(IV[0])),
        xp.full((n,), xp.uint32(IV[1])),
        xp.full((n,), xp.uint32(IV[2])),
        xp.full((n,), xp.uint32(IV[3])),
        zeros,  # counter lo
        zeros,  # counter hi
        xp.full((n,), xp.uint32(_BLOCK_LEN)),
        xp.full((n,), xp.uint32(_FLAGS)),
    ]

    def g(s, a, b, c, d, mx, my):
        s[a] = s[a] + s[b] + mx
        s[d] = _rotr(s[d] ^ s[a], 16, xp)
        s[c] = s[c] + s[d]
        s[b] = _rotr(s[b] ^ s[c], 12, xp)
        s[a] = s[a] + s[b] + my
        s[d] = _rotr(s[d] ^ s[a], 8, xp)
        s[c] = s[c] + s[d]
        s[b] = _rotr(s[b] ^ s[c], 7, xp)

    for r in range(7):
        g(state, 0, 4, 8, 12, m[0], m[1])
        g(state, 1, 5, 9, 13, m[2], m[3])
        g(state, 2, 6, 10, 14, m[4], m[5])
        g(state, 3, 7, 11, 15, m[6], m[7])
        g(state, 0, 5, 10, 15, m[8], m[9])
        g(state, 1, 6, 11, 12, m[10], m[11])
        g(state, 2, 7, 8, 13, m[12], m[13])
        g(state, 3, 4, 9, 14, m[14], m[15])
        if r < 6:
            m = [m[MSG_PERMUTATION[i]] for i in range(16)]

    out = [state[i] ^ state[i + 8] for i in range(4)]
    # hash bytes are LE words; convert back to the BE-word label layout
    return xp.stack([_bswap32(w, xp) for w in out], axis=-1)
