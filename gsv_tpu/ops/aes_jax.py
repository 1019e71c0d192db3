"""Bitsliced fixed-key AES-128 over label-word arrays (numpy / jax.numpy).

This is the TPU-native replacement for the reference's AES-NI hot primitive
(``src/hashers/aes_ni.rs``): instead of hardware AES rounds per block, every
bit of the AES state becomes a *plane* packed 32 blocks per uint32, and the
round function is evaluated as vectorized boolean algebra on a ``(8, 16, m)``
tensor (bit, byte-position, block-group) — pure VPU work with no gathers in
the inner loop.  The S-box is the derived tower-field circuit from
``sbox_circuit.py``; ShiftRows and the pack/unpack edges are static
permutations; round keys for the fixed key ``0x42*16`` are compile-time
constant masks.

All functions take ``xp`` (numpy or jax.numpy) so the same code serves as the
host reference, the jitted XLA path and the body of Pallas kernels.

Block layout: ``(n, 4)`` uint32 in big-endian word order (word 0 = block
bytes 0..3, byte 0 in the MSB), matching ``gsv_tpu.core.labels``.
``n`` must be a multiple of 32.
"""

from __future__ import annotations

import numpy as np

from gsv_tpu.ops.aes_host import ROUND_KEYS
from gsv_tpu.ops.bits import transpose32
from gsv_tpu.ops.sbox_circuit import OP_AND, OP_NOT, OP_XOR, sbox_circuit

# ------------------------------------------------------------------
# Static index maps between word-bit layout and (bit, byte) planes
# ------------------------------------------------------------------

# After transpose32 of blocks[:, j] we have, for word j, 32 planes indexed by
# t = bit position in the word.  Word j (big-endian) holds block bytes
# 4j..4j+3 with byte 4j in the MSB, so bit t belongs to byte p = 4j + 3 - t//8
# at bit k = t % 8.  PLANE_FROM_WORDBIT[k, p] = flat index j*32 + t.
_PLANE_FROM_WORDBIT = np.zeros((8, 16), dtype=np.int32)
for _j in range(4):
    for _t in range(32):
        _p = 4 * _j + 3 - _t // 8
        _k = _t % 8
        _PLANE_FROM_WORDBIT[_k, _p] = _j * 32 + _t
# inverse map: WORDBIT_FROM_PLANE[j*32+t] = flat index k*16+p
_WORDBIT_FROM_PLANE = np.zeros(128, dtype=np.int32)
for _k in range(8):
    for _p in range(16):
        _WORDBIT_FROM_PLANE[_PLANE_FROM_WORDBIT[_k, _p]] = _k * 16 + _p

# ShiftRows: state byte p = 4c + r; out(r, c) = in(r, (c + r) % 4)
_SHIFTROWS_SRC = np.array(
    [4 * (((p // 4) + (p % 4)) % 4) + (p % 4) for p in range(16)], dtype=np.int32
)

# Fixed-key round-key bit masks: (11, 8, 16) — 0xFFFFFFFF where key bit set.
_RK_MASKS = np.zeros((11, 8, 16), dtype=np.uint32)
for _r in range(11):
    for _p in range(16):
        for _k in range(8):
            if (int(ROUND_KEYS[_r, _p]) >> _k) & 1:
                _RK_MASKS[_r, _k, _p] = 0xFFFFFFFF


def pack_planes(blocks, xp=np):
    """(n, 4) uint32 blocks -> (8, 16, m) uint32 bit planes (m = n // 32)."""
    n = blocks.shape[0]
    m = n // 32
    w = blocks.T.reshape(4, m, 32)  # (word j, group, block-in-group)
    t = transpose32(w, xp=xp)  # (4, m, 32): [j, g, bit t] packed over blocks
    flat = xp.transpose(t, (0, 2, 1)).reshape(128, m)  # index j*32+t
    planes = flat[_PLANE_FROM_WORDBIT.reshape(-1)].reshape(8, 16, m)
    return planes


def unpack_planes(planes, xp=np):
    """(8, 16, m) uint32 bit planes -> (n, 4) uint32 blocks."""
    m = planes.shape[-1]
    flat = planes.reshape(128, m)[_WORDBIT_FROM_PLANE]  # index j*32+t
    t = xp.transpose(flat.reshape(4, 32, m), (0, 2, 1))  # (4, m, 32)
    w = transpose32(t, xp=xp)  # involution
    return w.reshape(4, m * 32).T


def _sub_bytes(planes, xp):
    """Apply the S-box circuit to the 8 bit planes, vectorized over (16, m)."""
    circ, outs = sbox_circuit()
    regs: list = [None] * circ.n_regs
    for k in range(8):
        regs[k] = planes[k]
    ones = xp.uint32(0xFFFFFFFF)
    for op, d, a, b in circ.ops:
        if op == OP_XOR:
            regs[d] = regs[a] ^ regs[b]
        elif op == OP_AND:
            regs[d] = regs[a] & regs[b]
        elif op == OP_NOT:
            regs[d] = regs[a] ^ ones
    return xp.stack([regs[o] for o in outs], axis=0)


def _xtime(v, xp):
    """GF(2^8) multiply-by-2 on the bit-plane axis 0 of shape (8, ...)."""
    z = v[7]
    return xp.stack(
        [z, v[0] ^ z, v[1], v[2] ^ z, v[3] ^ z, v[4], v[5], v[6]], axis=0
    )


def _mix_columns(planes, xp):
    """(8, 16, m) -> (8, 16, m); byte p = 4c + r, columns mixed per c."""
    s = planes.reshape(8, 4, 4, planes.shape[-1])  # (bit, c, r, m)
    a = [s[:, :, r] for r in range(4)]
    total = a[0] ^ a[1] ^ a[2] ^ a[3]
    outs = []
    for r in range(4):
        t = a[r] ^ a[(r + 1) % 4]
        outs.append(a[r] ^ total ^ _xtime(t, xp))
    return xp.stack(outs, axis=2).reshape(8, 16, planes.shape[-1])


def aes_encrypt_planes(planes, xp=np):
    """Fixed-key AES-128 on (8, 16, m) bit planes."""
    rk = _RK_MASKS if xp is np else xp.asarray(_RK_MASKS)
    s = planes ^ rk[0][:, :, None]
    for rnd in range(1, 10):
        s = _sub_bytes(s, xp)
        s = s[:, _SHIFTROWS_SRC, :]
        s = _mix_columns(s, xp)
        s = s ^ rk[rnd][:, :, None]
    s = _sub_bytes(s, xp)
    s = s[:, _SHIFTROWS_SRC, :]
    s = s ^ rk[10][:, :, None]
    return s


def aes_encrypt_words(blocks, xp=np):
    """Fixed-key AES-128 ECB over (n, 4) uint32 word blocks, n % 32 == 0."""
    if blocks.shape[0] % 32 != 0:
        raise ValueError("block count must be a multiple of 32 (pad first)")
    planes = pack_planes(blocks, xp=xp)
    out = aes_encrypt_planes(planes, xp=xp)
    return unpack_planes(out, xp=xp)
