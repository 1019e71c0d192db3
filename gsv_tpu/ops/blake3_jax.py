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


# message schedule per round: indices into the original 16 message words,
# split into column-phase (mx, my) and diagonal-phase (mx, my) quads
def _schedules():
    perm = list(range(16))
    rounds = []
    for _ in range(7):
        rounds.append(
            (
                perm[0:8:2], perm[1:8:2],  # columns mx, my
                perm[8:16:2], perm[9:16:2],  # diagonals mx, my
            )
        )
        perm = [perm[MSG_PERMUTATION[i]] for i in range(16)]
    return rounds


_ROUND_SCHEDULES = _schedules()


def blake3_hash_words(labels, gid_hi, gid_lo, xp=np):
    """Gate hash for a wave: labels (n, 4) BE-word uint32, gids (n,) uint32
    pairs -> (n, 4) BE-word uint32 outputs (first 16 bytes of the hash).

    Columns/diagonals processed 4-wide: state is (16, n); each G quad is a
    handful of ops on (4, n) slices (XLA:CPU chokes on the fully unrolled
    scalar-variable form).
    """
    n = labels.shape[0]
    zeros = xp.zeros((n,), dtype=xp.uint32)
    # message words: LE u32 over (label_be_bytes || gid_le_bytes || 0-pad)
    m = xp.stack(
        [
            _bswap32(labels[:, 0], xp),
            _bswap32(labels[:, 1], xp),
            _bswap32(labels[:, 2], xp),
            _bswap32(labels[:, 3], xp),
            gid_lo.astype(xp.uint32),
            gid_hi.astype(xp.uint32),
        ]
        + [zeros] * 10,
        axis=0,
    )  # (16, n)

    iv8 = xp.asarray(np.array(IV, dtype=np.uint32))[:, None]
    tail = xp.asarray(
        np.array([IV[0], IV[1], IV[2], IV[3], 0, 0, _BLOCK_LEN, _FLAGS], dtype=np.uint32)
    )[:, None]
    ones = xp.ones((1, n), dtype=xp.uint32)
    state = xp.concatenate([iv8 * ones, tail * ones], axis=0)  # (16, n)

    _DIAG_B = np.array([5, 6, 7, 4])
    _DIAG_C = np.array([10, 11, 8, 9])
    _DIAG_D = np.array([15, 12, 13, 14])
    _COLS = np.array([0, 1, 2, 3])

    def g4(a, b, c, d, mx, my):
        a = a + b + mx
        d = _rotr(d ^ a, 16, xp)
        c = c + d
        b = _rotr(b ^ c, 12, xp)
        a = a + b + my
        d = _rotr(d ^ a, 8, xp)
        c = c + d
        b = _rotr(b ^ c, 7, xp)
        return a, b, c, d

    for cmx, cmy, dmx, dmy in _ROUND_SCHEDULES:
        a, b, c, d = (
            state[0:4], state[4:8], state[8:12], state[12:16]
        )
        a, b, c, d = g4(a, b, c, d, m[np.asarray(cmx)], m[np.asarray(cmy)])
        # diagonal phase operates on rotated lanes
        b = b[np.array([1, 2, 3, 0])]
        c = c[np.array([2, 3, 0, 1])]
        d = d[np.array([3, 0, 1, 2])]
        a, b, c, d = g4(a, b, c, d, m[np.asarray(dmx)], m[np.asarray(dmy)])
        # rotate back
        b = b[np.array([3, 0, 1, 2])]
        c = c[np.array([2, 3, 0, 1])]
        d = d[np.array([1, 2, 3, 0])]
        state = xp.concatenate([a, b, c, d], axis=0)

    out = state[0:4] ^ state[8:12]  # (4, n)
    return _bswap32(out.T, xp)
