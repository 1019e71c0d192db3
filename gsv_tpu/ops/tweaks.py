"""Vectorized gate-id tweak computation (u64 math as uint32 pairs).

Reference parity: ``src/hashers/mod.rs:57-64`` —

    t0 = gate_id ^ 0x1234_5678_9ABC_DEF0
    t1 = gate_id.wrapping_mul(0xDEAD_BEEF_CAFE_BABE)
    mask bytes = t0.to_le_bytes() || t1.to_le_bytes()

Expressed in the (n, 4) big-endian word layout of ``gsv_tpu.core.labels``:
word0 = bswap32(t0 & 0xFFFFFFFF), word1 = bswap32(t0 >> 32),
word2 = bswap32(t1 & 0xFFFFFFFF), word3 = bswap32(t1 >> 32).

64-bit values are carried as (hi, lo) uint32 pairs because we keep JAX in
32-bit mode; the 64x64 multiply-low is built from 16-bit limb products.
"""

from __future__ import annotations

import numpy as np

K_XOR_HI = np.uint32(0x12345678)
K_XOR_LO = np.uint32(0x9ABCDEF0)
K_MUL_HI = 0xDEADBEEF
K_MUL_LO = 0xCAFEBABE


def mul32x32_64(a, b, xp=np):
    """Full 32x32 -> 64-bit product as (hi, lo) uint32."""
    a = a.astype(xp.uint32) if hasattr(a, "astype") else xp.uint32(a)
    b = b.astype(xp.uint32) if hasattr(b, "astype") else xp.uint32(b)
    m16 = xp.uint32(0xFFFF)
    a0 = a & m16
    a1 = a >> xp.uint32(16)
    b0 = b & m16
    b1 = b >> xp.uint32(16)
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    hh = a1 * b1
    mid = lh + hl  # may wrap
    carry_mid = (mid < lh).astype(xp.uint32)
    lo = ll + ((mid & m16) << xp.uint32(16))  # may wrap
    carry_lo = (lo < ll).astype(xp.uint32)
    hi = hh + (mid >> xp.uint32(16)) + (carry_mid << xp.uint32(16)) + carry_lo
    return hi, lo


def add64(a_hi, a_lo, b_hi, b_lo, xp=np):
    """(hi, lo) + (hi, lo) mod 2^64."""
    lo = a_lo + b_lo
    carry = (lo < a_lo).astype(xp.uint32)
    hi = a_hi + b_hi + carry
    return hi, lo


def mul64_lo(a_hi, a_lo, b_hi, b_lo, xp=np):
    """Low 64 bits of a 64x64 product, as (hi, lo) uint32."""
    p_hi, p_lo = mul32x32_64(a_lo, b_lo, xp=xp)
    p_hi = p_hi + a_lo * b_hi + a_hi * b_lo  # mod 2^32 is fine for the high word
    return p_hi, p_lo


def bswap32(x, xp=np):
    x = x.astype(xp.uint32) if hasattr(x, "astype") else xp.uint32(x)
    return (
        ((x & xp.uint32(0xFF)) << xp.uint32(24))
        | ((x & xp.uint32(0xFF00)) << xp.uint32(8))
        | ((x >> xp.uint32(8)) & xp.uint32(0xFF00))
        | (x >> xp.uint32(24))
    )


def tweak_words(gid_hi, gid_lo, xp=np):
    """Tweak masks for gate ids given as (hi, lo) uint32 arrays -> (n, 4) uint32."""
    t0_hi = gid_hi ^ K_XOR_HI
    t0_lo = gid_lo ^ K_XOR_LO
    t1_hi, t1_lo = mul64_lo(
        gid_hi, gid_lo, xp.uint32(K_MUL_HI), xp.uint32(K_MUL_LO), xp=xp
    )
    return xp.stack(
        [
            bswap32(t0_lo, xp=xp),
            bswap32(t0_hi, xp=xp),
            bswap32(t1_lo, xp=xp),
            bswap32(t1_hi, xp=xp),
        ],
        axis=-1,
    )


def tweak_words_wm(gid_hi, gid_lo, xp=np):
    """Word-major tweak masks: (hi, lo) uint32 arrays -> (4, n) uint32.

    Same per-block values as ``tweak_words`` (word axis leading instead of
    trailing) — the layout the word-major arena path hashes in."""
    t0_hi = gid_hi ^ K_XOR_HI
    t0_lo = gid_lo ^ K_XOR_LO
    t1_hi, t1_lo = mul64_lo(
        gid_hi, gid_lo, xp.uint32(K_MUL_HI), xp.uint32(K_MUL_LO), xp=xp
    )
    return xp.stack(
        [
            bswap32(t0_lo, xp=xp),
            bswap32(t0_hi, xp=xp),
            bswap32(t1_lo, xp=xp),
            bswap32(t1_hi, xp=xp),
        ],
        axis=0,
    )


def split64(vals) -> tuple[np.ndarray, np.ndarray]:
    """Python ints / int64 array -> (hi, lo) uint32 arrays (host helper)."""
    arr = np.asarray(vals, dtype=np.uint64)
    return (arr >> np.uint64(32)).astype(np.uint32), (arr & np.uint64(0xFFFFFFFF)).astype(
        np.uint32
    )
