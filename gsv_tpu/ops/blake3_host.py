"""Pure-Python BLAKE3 (host side).

Reference parity: the ``blake3`` crate backing ``Blake3Hasher``
(src/hashers/mod.rs:23-51: H(label||gate_id_le) truncated to 16 bytes) and
``S::hash`` / ``S::hash_together`` (src/core/s.rs:62-83).  Gate-hash inputs
are ≤64 bytes, so the hot path is a single-chunk, single-block compression;
the general tree mode is implemented for completeness.

Verified against the official empty-input test vector.
"""

from __future__ import annotations

import struct

IV = (
    0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
    0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19,
)

MSG_PERMUTATION = (2, 6, 3, 10, 7, 0, 4, 13, 1, 11, 12, 5, 9, 14, 15, 8)

CHUNK_START = 1
CHUNK_END = 2
PARENT = 4
ROOT = 8

MASK32 = 0xFFFFFFFF


def _rotr(x, n):
    return ((x >> n) | (x << (32 - n))) & MASK32


def _g(state, a, b, c, d, mx, my):
    state[a] = (state[a] + state[b] + mx) & MASK32
    state[d] = _rotr(state[d] ^ state[a], 16)
    state[c] = (state[c] + state[d]) & MASK32
    state[b] = _rotr(state[b] ^ state[c], 12)
    state[a] = (state[a] + state[b] + my) & MASK32
    state[d] = _rotr(state[d] ^ state[a], 8)
    state[c] = (state[c] + state[d]) & MASK32
    state[b] = _rotr(state[b] ^ state[c], 7)


def _compress(cv, block_words, counter, block_len, flags):
    state = [
        cv[0], cv[1], cv[2], cv[3], cv[4], cv[5], cv[6], cv[7],
        IV[0], IV[1], IV[2], IV[3],
        counter & MASK32, (counter >> 32) & MASK32, block_len, flags,
    ]
    m = list(block_words)
    for r in range(7):
        _g(state, 0, 4, 8, 12, m[0], m[1])
        _g(state, 1, 5, 9, 13, m[2], m[3])
        _g(state, 2, 6, 10, 14, m[4], m[5])
        _g(state, 3, 7, 11, 15, m[6], m[7])
        _g(state, 0, 5, 10, 15, m[8], m[9])
        _g(state, 1, 6, 11, 12, m[10], m[11])
        _g(state, 2, 7, 8, 13, m[12], m[13])
        _g(state, 3, 4, 9, 14, m[14], m[15])
        if r < 6:
            m = [m[MSG_PERMUTATION[i]] for i in range(16)]
    return [
        (state[i] ^ state[i + 8]) & MASK32 for i in range(8)
    ] + [(state[i + 8] ^ cv[i]) & MASK32 for i in range(8)]


def _words_from_block(block: bytes) -> list[int]:
    block = block.ljust(64, b"\x00")
    return list(struct.unpack("<16I", block))


def _chunk_cv(chunk: bytes, chunk_counter: int, is_root_candidate: bool):
    """Compress one ≤1024-byte chunk; returns the 8-word chaining value, or
    for root chunks the full compression inputs for output expansion."""
    cv = list(IV)
    blocks = [chunk[i : i + 64] for i in range(0, max(len(chunk), 1), 64)]
    outputs = None
    for i, blk in enumerate(blocks):
        flags = 0
        if i == 0:
            flags |= CHUNK_START
        if i == len(blocks) - 1:
            flags |= CHUNK_END
            outputs = (list(cv), _words_from_block(blk), chunk_counter, len(blk), flags)
        out = _compress(cv, _words_from_block(blk), chunk_counter, len(blk), flags)
        cv = out[:8]
    return cv, outputs


def blake3(data: bytes, out_len: int = 32) -> bytes:
    """BLAKE3 hash (default mode, no key/derive)."""
    CHUNK = 1024
    chunks = [data[i : i + CHUNK] for i in range(0, max(len(data), 1), CHUNK)]
    if len(chunks) == 1:
        cv, (in_cv, words, counter, blen, flags) = _chunk_cv(chunks[0], 0, True)
        return _root_output(in_cv, words, blen, flags, out_len)

    # build the binary tree of chaining values
    cvs = []
    for i, ch in enumerate(chunks):
        cv, _ = _chunk_cv(ch, i, False)
        cvs.append(cv)
    while len(cvs) > 2:
        nxt = []
        pairs = len(cvs) // 2
        for i in range(pairs):
            words = cvs[2 * i] + cvs[2 * i + 1]
            out = _compress(list(IV), words, 0, 64, PARENT)
            nxt.append(out[:8])
        if len(cvs) % 2:
            nxt.append(cvs[-1])
        cvs = nxt
    words = cvs[0] + cvs[1]
    return _root_output(list(IV), words, 64, PARENT, out_len)


def _root_output(cv, block_words, block_len, flags, out_len: int) -> bytes:
    out = b""
    counter = 0
    while len(out) < out_len:
        words = _compress(cv, block_words, counter, block_len, flags | ROOT)
        out += struct.pack("<16I", *words)
        counter += 1
    return out[:out_len]


# ------------------------------------------------------------------
# Reference hasher entry points
# ------------------------------------------------------------------


def blake3_hash_with_gate(label: int, gate_id: int) -> int:
    """``Blake3Hasher::hash_with_gate``: H(label_be || gate_id_le)[0:16]."""
    from gsv_tpu.core.labels import s_from_bytes, s_to_bytes

    data = s_to_bytes(label) + (gate_id & (2**64 - 1)).to_bytes(8, "little")
    return s_from_bytes(blake3(data, 16))


def s_hash(label: int) -> int:
    """``S::hash``: BLAKE3 XOF over the 16-byte label, truncated to 16."""
    from gsv_tpu.core.labels import s_from_bytes, s_to_bytes

    return s_from_bytes(blake3(s_to_bytes(label), 16))


def s_hash_together(a: int, b: int) -> int:
    from gsv_tpu.core.labels import s_from_bytes, s_to_bytes

    return s_from_bytes(blake3(s_to_bytes(a) + s_to_bytes(b), 16))
