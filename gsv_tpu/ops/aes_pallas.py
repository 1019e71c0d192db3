"""Pallas TPU kernel for the bitsliced fixed-key AES-128 gate hash.

TPU-native counterpart of the reference's AES-NI module
(``src/hashers/aes_ni.rs:39-216``): one grid step encrypts a VMEM-resident
tile of bit planes with the tower-field S-box circuit, keeping all ten
rounds' intermediates on-chip instead of round-tripping through HBM.  The
boolean round function is shared with ``aes_jax.py`` (``aes_encrypt_planes``)
— Pallas only changes *where* it runs: the whole 10-round dependency chain is
fused into a single kernel, so HBM traffic is exactly one read + one write of
the plane tensor.

Layout: planes are ``(8, 16, m)`` uint32 (bit, byte-position, lane) with each
lane packing 32 AES blocks (see ``aes_jax.pack_planes``).  The grid tiles the
lane axis in ``LANE_TILE`` chunks (last dim multiple of 128 for VPU tiling);
the (16, LANE_TILE) trailing shape maps directly onto (sublane, lane) tiles.

``aes_encrypt_words_pallas`` is a drop-in for ``aes_jax.aes_encrypt_words``
(pack/unpack stay in XLA — they are static bit-permutations that XLA fuses
into the neighbouring gather/scatter); ``interpret=True`` runs the same
kernel on CPU for tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gsv_tpu.ops.aes_jax import (
    _RK_MASKS,
    _SHIFTROWS_SRC,
    _mix_columns,
    _sub_bytes,
    pack_planes,
    unpack_planes,
)

LANE_TILE = 512  # lanes per grid step; 512 * 32 blocks = 16,384 blocks/tile

# ------------------------------------------------------------------
# Row-register bit transpose for the fused words kernel.  The XLA-side
# pack/unpack (bits.transpose32 on a (..., 32) minor axis) costs ~2/3 of
# the words-path wall (r3 probe: planes kernel 1.28 B blocks/s vs words
# 0.43).  Inside the kernel the same Hacker's Delight masked-swap runs on
# 32 SUBLANE rows of (m,) lanes — static row slices + elementwise ops,
# the shapes Mosaic is fastest at.  ~80 u32 ops/block for pack+unpack
# vs the rounds' ~855.
# ------------------------------------------------------------------

_T32_STAGES = (
    (16, 0x0000FFFF),
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _t32_rows(rows, xp):
    """Hacker's Delight 32x32 bit transpose over 32 row vectors.

    Plain orientation (an involution), same as ``bits.transpose32``:
    bit i of out[t] == bit t of rows[i].
    """
    A = list(rows)
    for j, m in _T32_STAGES:
        mask = xp.uint32(m)
        sj = xp.uint32(j)
        k = 0
        while k < 32:
            t = ((A[k] >> sj) ^ A[k + j]) & mask
            A[k + j] = A[k + j] ^ t
            A[k] = A[k] ^ (t << sj)
            k = (k + j + 1) & ~j
        # HD's running-mask update m ^= m << j is folded into the table
    return A


def pack_planes_rows(wt, xp):
    """(4, 32, m) word-transposed blocks -> (8, 16, m) bit planes.

    ``wt[j, i, g] = blocks[g*32 + i, j]`` (see aes_encrypt_words_fused).
    Bit-identical to ``aes_jax.pack_planes`` (pinned in tests)."""
    flat = [None] * 128  # index j*32 + t, as in aes_jax._PLANE_FROM_WORDBIT
    for j in range(4):
        out = _t32_rows([wt[j, i] for i in range(32)], xp)
        for t in range(32):
            flat[j * 32 + t] = out[t]
    from gsv_tpu.ops.aes_jax import _PLANE_FROM_WORDBIT

    sel = [flat[idx] for idx in _PLANE_FROM_WORDBIT.reshape(-1)]
    return xp.stack(sel, axis=0).reshape(8, 16, wt.shape[-1])


def unpack_planes_rows(planes, xp):
    """(8, 16, m) bit planes -> (4, 32, m) word-transposed blocks."""
    from gsv_tpu.ops.aes_jax import _WORDBIT_FROM_PLANE

    p128 = planes.reshape(128, planes.shape[-1])
    flat = [p128[idx] for idx in _WORDBIT_FROM_PLANE]  # index j*32 + t
    out = []
    for j in range(4):
        w = _t32_rows([flat[j * 32 + t] for t in range(32)], xp)
        out.append(xp.stack(w, axis=0))
    return xp.stack(out, axis=0)


def _lane_tile(m: int) -> int:
    """Static per-shape tile: full 512-lane tiles when the batch fills them,
    down to the 128-lane VPU minimum so medium waves don't pad 4-16x."""
    for t in (512, 256, 128):
        if m >= t:
            return t
    return 128

# Pallas kernels cannot capture array constants, so ShiftRows is a static
# slice-stack (fixed permutation) and round keys arrive as a kernel input.
_SR = [int(p) for p in _SHIFTROWS_SRC]


def _shift_rows(s):
    return jnp.stack([s[:, p, :] for p in _SR], axis=1)


def _aes_tile_kernel(planes_ref, rk_ref, out_ref):
    s = planes_ref[...]
    rk = rk_ref[...]
    s = s ^ rk[0][:, :, None]
    for rnd in range(1, 10):
        s = _sub_bytes(s, jnp)
        s = _shift_rows(s)
        s = _mix_columns(s, jnp)
        s = s ^ rk[rnd][:, :, None]
    s = _sub_bytes(s, jnp)
    s = _shift_rows(s)
    out_ref[...] = s ^ rk[10][:, :, None]


@functools.partial(jax.jit, static_argnames=("interpret",))
def aes_encrypt_planes_pallas(planes, interpret=False):
    """Fixed-key AES-128 on (8, 16, m) bit planes as a Pallas kernel.

    m must be a multiple of the static per-shape lane tile (callers pad;
    each lane is 32 blocks).
    """
    from jax.experimental import pallas as pl

    m = planes.shape[-1]
    tile = _lane_tile(m)
    assert m % tile == 0, (m, tile)
    grid = (m // tile,)
    spec = pl.BlockSpec((8, 16, tile), lambda i: (0, 0, i))
    rk_spec = pl.BlockSpec((11, 8, 16), lambda i: (0, 0, 0))
    return pl.pallas_call(
        _aes_tile_kernel,
        grid=grid,
        in_specs=[spec, rk_spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(planes.shape, jnp.uint32),
        interpret=interpret,
    )(planes, jnp.asarray(_RK_MASKS))


def aes_encrypt_words_pallas(blocks, interpret=False):
    """Fixed-key AES-128 ECB over (n, 4) uint32 word blocks via Pallas.

    Pads the lane axis up to a tile multiple (zero lanes are encrypted
    and discarded — fixed key, so no data-dependent cost).
    """
    n = blocks.shape[0]
    if n % 32 != 0:
        raise ValueError("block count must be a multiple of 32 (pad first)")
    planes = pack_planes(blocks, xp=jnp)
    m = planes.shape[-1]
    pad = (-m) % _lane_tile(m)
    if pad:
        planes = jnp.pad(planes, ((0, 0), (0, 0), (0, pad)))
    out = aes_encrypt_planes_pallas(planes, interpret=interpret)
    if pad:
        out = out[..., :m]
    return unpack_planes(out, xp=jnp)


def _aes_words_tile_kernel(wt_ref, rk_ref, out_ref):
    """Fused kernel: in-VMEM pack -> 10 rounds -> unpack.

    Tile layout (4, 32, mtile): word j, block-in-group i, group g — the
    bit transposes run as 32 sublane-row register ops, so the only HBM
    traffic is one read + one write of the 16 bytes/block."""
    wt = wt_ref[...]
    rk = rk_ref[...]
    s = pack_planes_rows(wt, jnp)
    s = s ^ rk[0][:, :, None]
    for rnd in range(1, 10):
        s = _sub_bytes(s, jnp)
        s = _shift_rows(s)
        s = _mix_columns(s, jnp)
        s = s ^ rk[rnd][:, :, None]
    s = _sub_bytes(s, jnp)
    s = _shift_rows(s)
    s = s ^ rk[10][:, :, None]
    out_ref[...] = unpack_planes_rows(s, jnp)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _aes_wt_pallas(wt, interpret=False):
    """(4, 32, m) word-transposed blocks -> same, encrypted (fused kernel)."""
    from jax.experimental import pallas as pl

    m = wt.shape[-1]
    tile = _lane_tile(m)
    assert m % tile == 0, (m, tile)
    spec = pl.BlockSpec((4, 32, tile), lambda i: (0, 0, i))
    rk_spec = pl.BlockSpec((11, 8, 16), lambda i: (0, 0, 0))
    return pl.pallas_call(
        _aes_words_tile_kernel,
        grid=(m // tile,),
        in_specs=[spec, rk_spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(wt.shape, jnp.uint32),
        interpret=interpret,
    )(wt, jnp.asarray(_RK_MASKS))


def aes_encrypt_words_fused(blocks, interpret=False):
    """Fixed-key AES-128 ECB over (n, 4) word blocks, pack/rounds/unpack all
    inside one Pallas kernel.  The only XLA-side work is the layout
    transpose to (4, 32, m) and back (bandwidth-bound, ~7% of the kernel's
    bytes)."""
    n = blocks.shape[0]
    if n % 32 != 0:
        raise ValueError("block count must be a multiple of 32 (pad first)")
    m = n // 32
    wt = blocks.reshape(m, 32, 4).transpose(2, 1, 0)
    pad = (-m) % _lane_tile(m)
    if pad:
        wt = jnp.pad(wt, ((0, 0), (0, 0), (0, pad)))
    out = _aes_wt_pallas(wt, interpret=interpret)
    if pad:
        out = out[..., :m]
    return out.transpose(2, 1, 0).reshape(n, 4)


# ------------------------------------------------------------------
# v2 fused kernel: NO XLA-side data movement at all.  The r3/r4 probes
# show the (n,4)->(4,32,m) XLA transpose outside `aes_encrypt_words_fused`
# costs ~2.4x (0.525 vs 1.283 B blocks/s for the transpose-free planes
# kernel).  Here the host side only does a FREE row-major reshape
# (n,4)->(m,128) (bitcast view: row g = 32 consecutive blocks, lane
# q = 4*i + j for block-in-group i, word j) and the kernel transposes the
# (tile,128) VMEM tile itself — a 32-bit 2D transpose Mosaic lowers on the
# cross-lane unit — before the same register bit-butterflies and rounds.
# ------------------------------------------------------------------


def _aes_words2_tile_kernel(x_ref, rk_ref, out_ref):
    x = x_ref[...]  # (tile, 128): [group g, 4*i + j]
    rk = rk_ref[...]
    xT = x.T  # (128, tile): row 4*i+j = word j of block i across groups
    from gsv_tpu.ops.aes_jax import _PLANE_FROM_WORDBIT, _WORDBIT_FROM_PLANE

    flat = [None] * 128  # index j*32 + t, as in aes_jax._PLANE_FROM_WORDBIT
    for j in range(4):
        outw = _t32_rows([xT[i * 4 + j] for i in range(32)], jnp)
        for t in range(32):
            flat[j * 32 + t] = outw[t]
    sel = [flat[idx] for idx in _PLANE_FROM_WORDBIT.reshape(-1)]
    s = jnp.stack(sel, axis=0).reshape(8, 16, x.shape[0])

    s = s ^ rk[0][:, :, None]
    for rnd in range(1, 10):
        s = _sub_bytes(s, jnp)
        s = _shift_rows(s)
        s = _mix_columns(s, jnp)
        s = s ^ rk[rnd][:, :, None]
    s = _sub_bytes(s, jnp)
    s = _shift_rows(s)
    s = s ^ rk[10][:, :, None]

    p128 = s.reshape(128, x.shape[0])
    flat2 = [p128[idx] for idx in _WORDBIT_FROM_PLANE]  # index j*32 + t
    rows = [None] * 128
    for j in range(4):
        w = _t32_rows([flat2[j * 32 + t] for t in range(32)], jnp)
        for i in range(32):
            rows[i * 4 + j] = w[i]
    out_ref[...] = jnp.stack(rows, axis=0).T


@functools.partial(jax.jit, static_argnames=("interpret",))
def _aes_rows128_pallas(x, interpret=False):
    """(m, 128) row-major block rows -> same, encrypted (fully fused)."""
    from jax.experimental import pallas as pl

    m = x.shape[0]
    tile = _lane_tile(m)
    assert m % tile == 0, (m, tile)
    spec = pl.BlockSpec((tile, 128), lambda i: (i, 0))
    rk_spec = pl.BlockSpec((11, 8, 16), lambda i: (0, 0, 0))
    return pl.pallas_call(
        _aes_words2_tile_kernel,
        grid=(m // tile,),
        in_specs=[spec, rk_spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.uint32),
        interpret=interpret,
    )(x, jnp.asarray(_RK_MASKS))


def aes_encrypt_words_fused2(blocks, interpret=False):
    """Fixed-key AES-128 ECB over (n, 4) word blocks; pack/rounds/unpack AND
    the block-layout transpose all inside one Pallas kernel.  The XLA side is
    a free contiguous reshape (n, 4) -> (n//32, 128) plus lane-tile padding."""
    n = blocks.shape[0]
    if n % 32 != 0:
        raise ValueError("block count must be a multiple of 32 (pad first)")
    m = n // 32
    x = blocks.reshape(m, 128)
    pad = (-m) % _lane_tile(m)
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    out = _aes_rows128_pallas(x, interpret=interpret)
    if pad:
        out = out[:m]
    return out.reshape(n, 4)


# ------------------------------------------------------------------
# Batch-aware form: under jax.vmap (the group programs are vmapped over
# the instance batch), a plain pallas kernel would get a leading grid
# axis and pad EVERY instance's lanes to a full tile — a medium wave of
# 1024 blocks per instance would waste 16x.  AES is elementwise per
# block, so vmap == flatten-batch-into-blocks: this custom_vmap rule
# collapses (B, n, 4) -> (B*n, 4), making the kernel 32x wider instead.
# ------------------------------------------------------------------


def _make_words_cv(interpret: bool, fused_fn):
    from jax import custom_batching

    @custom_batching.custom_vmap
    def words(blocks):
        return fused_fn(blocks, interpret=interpret)

    @words.def_vmap
    def _rule(axis_size, in_batched, blocks):  # noqa: ARG001
        (bb,) = in_batched
        if not bb:
            return fused_fn(blocks, interpret=interpret), False
        B, n, w = blocks.shape
        out = fused_fn(blocks.reshape(B * n, w), interpret=interpret)
        return out.reshape(B, n, w), True

    return words


_WORDS_CV = {
    (False, 1): _make_words_cv(False, aes_encrypt_words_fused),
    (True, 1): _make_words_cv(True, aes_encrypt_words_fused),
    (False, 2): _make_words_cv(False, aes_encrypt_words_fused2),
    (True, 2): _make_words_cv(True, aes_encrypt_words_fused2),
}


def aes_encrypt_words_pallas_batched(blocks, interpret=False, version=1):
    """Drop-in for aes_encrypt_words_pallas that collapses a vmap batch
    axis into the block axis (one wide kernel per wave, not B narrow ones).
    ``version=2`` selects the fully fused kernel (in-kernel layout
    transpose, the ``aes_pallas2`` executor hasher)."""
    return _WORDS_CV[(bool(interpret), version)](blocks)


def aes_encrypt_wm(blocks_wm, interpret=False):
    """Fixed-key AES-128 over WORD-MAJOR blocks: (4, n) -> (4, n).

    The word-major arena path's hasher: (4, n) reshapes to the fused
    kernel's (4, 32, m) with STRIDED lane packing (lane g holds blocks
    {g, m+g, 2m+g, ...}) — a free contiguous reshape, killing the XLA-side
    layout transpose that costs the row-major path 2.3x (r4/r5 probes).
    AES is per-block elementwise, so lane assignment is bit-identical as
    long as pack and unpack share the convention (they are the same
    reshape).  n must be a multiple of 32 (callers pad)."""
    n = blocks_wm.shape[1]
    if n % 32 != 0:
        raise ValueError("block count must be a multiple of 32 (pad first)")
    m = n // 32
    pad = (-m) % _lane_tile(m)
    wt = blocks_wm.reshape(4, 32, m)
    if pad:
        wt = jnp.pad(wt, ((0, 0), (0, 0), (0, pad)))
    out = _aes_wt_pallas(wt, interpret=interpret)
    if pad:
        out = out[..., :m]
    return out.reshape(4, n)
