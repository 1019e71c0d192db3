"""Vectorized plan execution on JAX (CPU or TPU): Execute / Garble / Evaluate.

Each ``CompiledTape`` is replayed by a **generic** jitted step function that
derives every static (wave counts, lane widths, header size, ciphertext
count) from its argument shapes:

- free gates: one gather + XOR + scatter over ``(w, 4)`` uint32 labels
  (Free-XOR, ``halfgates_garbling.rs:14-16``)
- AND-variants: batched fixed-key bitsliced AES over ``2w`` blocks
  (garble: hash both a-labels; evaluate: hash the single active a-label),
  alpha-parameter selects as runtime masks, ciphertexts scattered into the
  stream slot given by their program-order rank
  (``halfgates_garbling.rs:17-69``)

There is ONE ``jax.jit`` object per (mode, hasher, batch); tape content
(operand/slot/mask streams) arrives as runtime arguments, so two
structurally identical tapes — same segment shapes — share one XLA
compilation even when their streams differ.  This matters doubly here:
compilations go through a remote-compile service (one round trip each), and
the ~1.3k distinct tapes of the Groth16 verifier collapse to far fewer
distinct shape signatures.

The arena is donated between steps so XLA updates it in place.  An optional
leading batch axis vectorizes whole cut-and-choose instances (same plan,
different seeds) — the TPU analogue of the reference's rayon instance pool
(``cut_and_choose/mod.rs:131-186``).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

# NOTE: do NOT enable jax's persistent compilation cache here.  In this
# environment executables cross machine boundaries (tunnel remote-compile on
# the terminal, local CPU host with different LLVM features), and cached AOT
# artifacts poison later runs with machine-feature / libtpu-version
# mismatches.  Compilation is cached per-process only.

from gsv_tpu.circuit.link import CopyStep, Plan, TapeStep
from gsv_tpu.circuit.tape import CompiledTape
from gsv_tpu.ops.aes_jax import aes_encrypt_words
from gsv_tpu.ops.blake3_jax import blake3_hash_words
from gsv_tpu.ops.tweaks import tweak_words


# Pallas AES pays off only when the block batch (INCLUDING the collapsed
# instance-batch axis — see aes_pallas.aes_encrypt_words_pallas_batched)
# fills lane tiles; below the effective threshold the XLA elementwise path
# wins (it fuses with the surrounding gather/scatter).  The group-program
# factories divide this by the batch size and thread the result through
# the hasher tag as "aes_pallas:<min_unbatched_blocks>" — the tag is only
# ever constructed internally; executors take plain "aes_pallas".
_PALLAS_MIN_BLOCKS = 4096


def _is_pallas(hasher) -> bool:
    return isinstance(hasher, str) and hasher.startswith("aes_pallas")


def _pallas_hasher_tag(hasher, batch) -> str:
    """Executor hasher -> internal tag with the per-batch effective gate."""
    if not _is_pallas(hasher) or ":" in hasher:
        return hasher
    return f"{hasher}:{max(32, _PALLAS_MIN_BLOCKS // max(batch or 1, 1))}"


def _aes_blocks(blocks, hasher):
    """Fixed-key AES over (n, 4) word blocks by hasher flavor."""
    if _is_pallas(hasher):
        minb = int(hasher.split(":")[1]) if ":" in hasher else _PALLAS_MIN_BLOCKS
        if blocks.shape[0] >= minb:
            from gsv_tpu.core.hw import tpu_available
            from gsv_tpu.ops.aes_pallas import aes_encrypt_words_pallas_batched

            ver = 2 if hasher.startswith("aes_pallas2") else 1
            return aes_encrypt_words_pallas_batched(
                blocks, interpret=not tpu_available(), version=ver)
    return aes_encrypt_words(blocks, xp=jnp)


def _gate_hash2(sel_a, other_a, hi, lo, hasher):
    """Hash both a-labels with the same gate id (garble path)."""
    if hasher == "aes" or _is_pallas(hasher):
        tw = tweak_words(hi, lo, xp=jnp)
        blocks = jnp.concatenate([sel_a ^ tw, other_a ^ tw], axis=0)
        n = blocks.shape[0]
        if n % 32:  # chunked waves can be sub-32-block; aligned traces unchanged
            blocks, _ = _pad32(blocks)
            return _aes_blocks(blocks, hasher)[:n]
        return _aes_blocks(blocks, hasher)
    blocks = jnp.concatenate([sel_a, other_a], axis=0)
    hi2 = jnp.concatenate([hi, hi])
    lo2 = jnp.concatenate([lo, lo])
    return blake3_hash_words(blocks, hi2, lo2, xp=jnp)


def _gate_hash1(labels, hi, lo, hasher):
    """Hash the single active a-label (evaluate path)."""
    if hasher == "aes" or _is_pallas(hasher):
        tw = tweak_words(hi, lo, xp=jnp)
        blocks, _ = _pad32(labels ^ tw)
        return _aes_blocks(blocks, hasher)[: labels.shape[0]]
    return blake3_hash_words(labels, hi, lo, xp=jnp)


def _abs_idx(op_codes, header_map, frame_base, H: int):
    ops = jnp.asarray(op_codes)
    hdr = header_map[jnp.clip(ops, 0, H - 1)]
    return jnp.where(ops < H, hdr, frame_base + ops - H)


_H2D_CHUNK = 8 << 20  # bytes; the tunneled client moves <=16MB buffers at
# ~14-28 MB/s but falls off a cliff above (measured r3: 64MB = 322s, i.e.
# 0.2 MB/s — a 126MB fat-tape header map or a 1.3GB arena upload costs
# MINUTES to HOURS if shipped whole).


def h2d(arr, chunk_bytes: int = _H2D_CHUNK):
    """Host->device transfer that never ships a buffer the tunnel chokes on:
    large arrays go up as <=chunk_bytes flat pieces and are reassembled by
    one on-device concatenate."""
    a = np.ascontiguousarray(arr)
    if a.nbytes <= chunk_bytes:
        return jnp.asarray(a)
    flat = a.reshape(-1)
    per = max(1, chunk_bytes // a.itemsize)
    parts = [jnp.asarray(flat[i : i + per]) for i in range(0, flat.size, per)]
    return jnp.concatenate(parts).reshape(a.shape)


def _pad32(blocks):
    n = blocks.shape[0]
    pad = (-n) % 32
    if pad:
        blocks = jnp.concatenate([blocks, jnp.zeros((pad, 4), jnp.uint32)], axis=0)
    return blocks, n


def _local_gid64(gid_base_hi, gid_base_lo, local):
    lo = gid_base_lo + jnp.asarray(local, dtype=jnp.uint32)
    carry = (lo < gid_base_lo).astype(jnp.uint32)
    hi = gid_base_hi + carry
    return hi, lo


# ----------------------------------------------------------------------
# Segment argument marshalling
# ----------------------------------------------------------------------

# Per-segment arrays as a dict pytree so tape programs take them as runtime
# arguments rather than embedded HLO constants — keeps programs small for
# the remote-compile service, dedupes device memory across instances, and
# (because all statics derive from shapes) lets structurally identical
# tapes share one compilation.
_SEG_FIELDS = (
    "f_a", "f_b", "f_c", "f_bmask", "f_flip",
    "n_a", "n_b", "n_c", "n_gid", "n_ct", "n_aa", "n_ab", "n_ac", "n_tt",
)


def seg_arg_list(tape: CompiledTape) -> list:
    """Segments as a list of field dicts (a jit-able pytree)."""
    return [{f: getattr(seg, f) for f in _SEG_FIELDS} for seg in tape.segments]


# ----------------------------------------------------------------------
# Shape bucketing: quantize every shape a tape exposes to the generic
# executors (wave counts, header size, output count, ciphertext count) so
# near-identical tapes land on the SAME aval signature and share one XLA
# compilation.  Padding is "trash-safe": padded gate rows scatter to the
# global trash slot, padded ciphertext lanes land in rows sliced off after
# the call, padded header/output entries point at trash.  Worst-case extra
# compute is the bucket ratio (~25%) on the padded segment only.
# ----------------------------------------------------------------------


def _bucket_grid(max_val: int = 1 << 22, ratio: float = 1.25) -> np.ndarray:
    g, v = [], 1
    while v <= max_val:
        g.append(v)
        v = max(v + 1, int(v * ratio))
    g.append(v)
    return np.array(g, dtype=np.int64)


_WAVE_GRID = _bucket_grid()


def _bucket(n: int) -> int:
    return int(_WAVE_GRID[np.searchsorted(_WAVE_GRID, n)])


def _bucket_pow2(n: int, lo: int = 16) -> int:
    b = lo
    while b < n:
        b <<= 1
    return b


def padded_seg_args_group(tape: CompiledTape):
    """Group-executor variant of ``padded_seg_args``: ciphertext lane padding
    is re-marked -1 (instead of ``ct_count``) so the group program can route
    padded lanes to its single trash row data-dependently — per-site stream
    bases make a per-tape sentinel ambiguous across sites."""
    segs, oo, meta = padded_seg_args(tape)
    ct = meta["ct"]
    out = []
    for d in segs:
        d = dict(d)
        d["n_ct"] = np.where(d["n_ct"] >= ct, -1, d["n_ct"]).astype(np.int32)
        out.append(d)
    return out, oo, meta


def padded_seg_args(tape: CompiledTape):
    """Bucket-padded segment args for the generic executors.

    Returns (segs, out_ops, meta) where meta carries the true/bucketed
    header size, ciphertext count and output count.  Operand codes >= the
    true header size (frame references) are re-encoded against the bucketed
    header size, since the executors decode frame slots as ``op - H`` with
    H taken from the header_map argument's length.
    """
    H = tape.header_size
    Hb = _bucket_pow2(H)
    shift = Hb - H
    ct = tape.ct_count
    ctb = _bucket(ct) if ct else 0
    segs = []
    for seg in tape.segments:
        nb = _bucket(seg.n_waves)
        pad = nb - seg.n_waves
        d = {}
        for f in _SEG_FIELDS:
            arr = getattr(seg, f)
            if shift and f in ("f_a", "f_b", "n_a", "n_b"):
                arr = np.where(arr >= H, arr + shift, arr).astype(arr.dtype)
            if pad:
                if f in ("f_c", "n_c"):
                    fill = -1  # scatter to trash
                elif f == "n_ct":
                    fill = ct  # first row past the real ciphertexts
                else:
                    fill = 0
                ext = np.full((pad,) + arr.shape[1:], fill, dtype=arr.dtype)
                arr = np.concatenate([arr, ext], axis=0)
            d[f] = arr
        segs.append(d)
    n_out = len(tape.out_ops)
    if n_out:
        ob = _bucket_pow2(n_out, lo=8)
        oo = tape.out_ops
        if shift:
            oo = np.where(oo >= H, oo + shift, oo).astype(oo.dtype)
        if ob > n_out:
            oo = np.concatenate([oo, np.zeros(ob - n_out, dtype=oo.dtype)])
    else:
        ob = 0
        oo = tape.out_ops
    meta = {"H": H, "Hb": Hb, "ct": ct, "ctb": ctb, "n_out": n_out, "ob": ob}
    return segs, oo, meta


def use_packed_segs(tape, S: int) -> bool:
    """Deterministic packed-vs-plain rule shared by executor and
    precompiler: siteloop-class programs (see _garble_group_segs) keep the
    plain segs pytree."""
    ct = tape.ct_count
    ctb = _bucket(ct) if ct else 0
    return not (S > 1 and ctb > _SITELOOP_CT_ROWS)


def pack_seg_args(segs):
    """Pack a padded seg-dict list into ``(pool32, pool8, layout)``.

    Per-call overhead through the tunneled PJRT client scales with pytree
    LEAF count (~125 seg arrays per group dispatch at ~100us each — the
    measured ~12-20ms/dispatch enqueue wall, docs/perf-model.md r3 notes).
    Shipping two pooled buffers instead cuts the leaf count to 14.
    ``layout`` is hashable and static — it keys the packed jit cache, and
    the slices it describes are compile-time constants inside the program.
    """
    p32, p8 = [], []
    off32 = off8 = 0
    layout = []
    for d in segs:
        seg_l = []
        for f in _SEG_FIELDS:
            arr = d[f]
            if arr.dtype == np.uint8:
                p8.append(arr.ravel())
                seg_l.append((f, ("u8", off8, arr.shape)))
                off8 += arr.size
            else:
                tag = "i32" if arr.dtype == np.int32 else "u32"
                p32.append(np.ascontiguousarray(arr).view(np.uint32).ravel())
                seg_l.append((f, (tag, off32, arr.shape)))
                off32 += arr.size
        layout.append(tuple(seg_l))
    pool32 = np.concatenate(p32) if p32 else np.zeros(0, np.uint32)
    pool8 = np.concatenate(p8) if p8 else np.zeros(0, np.uint8)
    return pool32, pool8, tuple(layout)


def unpack_seg_views(pool32, pool8, layout):
    """Rebuild the seg-dict list as static slices of the two pools (traced)."""
    import math

    segs = []
    for seg_l in layout:
        d = {}
        for f, (tag, off, shape) in seg_l:
            n = int(math.prod(shape))
            if tag == "u8":
                v = jax.lax.slice(pool8, (off,), (off + n,)).reshape(shape)
            else:
                v = jax.lax.slice(pool32, (off,), (off + n,)).reshape(shape)
                if tag == "i32":
                    v = jax.lax.bitcast_convert_type(v, jnp.int32)
            d[f] = v
        segs.append(d)
    return segs


def tape_signature(tape: CompiledTape):
    """The bucketed shape signature two tapes must share to share a compile."""
    H = tape.header_size
    ct = tape.ct_count
    n_out = len(tape.out_ops)
    return (
        _bucket_pow2(H),
        _bucket(ct) if ct else 0,
        _bucket_pow2(n_out, lo=8) if n_out else 0,
        tuple((_bucket(s.n_waves), s.cf, s.cn) for s in tape.segments),
    )


def _pad_map(m, k: int):
    """Pad a header/outputs map to k entries pointing at the trash slot.

    No-op (no device dispatch) when the caller already padded — drivers use
    ``PlanExecutor._step_maps`` to cache padded device maps per plan step.
    """
    n = m.shape[0]
    if n == k:
        return m
    return jnp.concatenate(
        [jnp.asarray(m), jnp.full((k - n,), _TRASH, dtype=jnp.asarray(m).dtype)]
    )


def _m32(x):
    """0/1 uint8 rows -> (n, c, 1) uint32 masks (inside jit; negligible cost)."""
    return (x.astype(jnp.uint32) * jnp.uint32(0xFFFFFFFF))[..., None]


_TRASH = 2  # absolute arena index for discarded writes (link.py layout)


def _row(arr, i):
    """Row i of a (n, c) array inside a fori_loop body."""
    return jax.lax.dynamic_index_in_dim(arr, i, axis=0, keepdims=False)


def _dst_idx(c_slots, frame_base):
    """Frame-slot row -> absolute scatter indices; -1 padding -> trash."""
    return jnp.where(c_slots < 0, _TRASH, frame_base + c_slots)


# ----------------------------------------------------------------------
# Generic per-tape step bodies (single instance; batching via jax.vmap).
# All statics (wave counts, lane widths cf/cn, header size H, ct count)
# come from argument SHAPES, so one traced program serves every tape with
# the same shape signature.
# ----------------------------------------------------------------------


def _execute_segs(arena, header_map, frame_base, segs):
    """Boolean execution: arena is (A,) uint8; one fori_loop per segment."""
    H = header_map.shape[0]
    for sv in segs:
        fa, fb, fc = sv["f_a"], sv["f_b"], sv["f_c"]
        fbm, ffl = sv["f_bmask"], sv["f_flip"]
        na, nb, nc = sv["n_a"], sv["n_b"], sv["n_c"]
        ntt = sv["n_tt"]
        n_waves, cf = fa.shape
        cn = na.shape[1]

        def body(i, arena, fa=fa, fb=fb, fc=fc, fbm=fbm, ffl=ffl, na=na, nb=nb, nc=nc, ntt=ntt, cf=cf, cn=cn):
            if cf:
                a = arena[_abs_idx(_row(fa, i), header_map, frame_base, H)]
                b = arena[_abs_idx(_row(fb, i), header_map, frame_base, H)]
                out = a ^ (b & _row(fbm, i)) ^ _row(ffl, i)
                arena = arena.at[_dst_idx(_row(fc, i), frame_base)].set(out)
            if cn:
                a = arena[_abs_idx(_row(na, i), header_map, frame_base, H)]
                b = arena[_abs_idx(_row(nb, i), header_map, frame_base, H)]
                tt = _row(ntt, i)
                out = ((tt >> (a * 2 + b)) & 1).astype(jnp.uint8)
                arena = arena.at[_dst_idx(_row(nc, i), frame_base)].set(out)
            return arena

        if n_waves == 1:
            arena = body(0, arena)
        else:
            arena = jax.lax.fori_loop(0, n_waves, body, arena)
    return arena


def _garble_segs(arena, ct_token, header_map, frame_base, delta, gid_hi, gid_lo, segs, hasher="aes"):
    """Half-gates garbling.  ``ct_token`` is a zero-byte (ct_bucket + 1, 0)
    shape carrier; the ciphertext buffer is created inside the program (so
    no per-step host-side allocation/dispatch) with a trailing trash row
    that absorbs padded-lane scatters and is sliced off.
    """
    H = header_map.shape[0]
    cts = jnp.zeros((ct_token.shape[0], 4), jnp.uint32)
    d1 = delta[None, :]
    for sv in segs:
        fa, fb, fc = sv["f_a"], sv["f_b"], sv["f_c"]
        fbm = _m32(sv["f_bmask"])
        ffl = _m32(sv["f_flip"])
        na, nb, nc = sv["n_a"], sv["n_b"], sv["n_c"]
        ngid, nct = sv["n_gid"], sv["n_ct"]
        aam = _m32(sv["n_aa"])
        abm = _m32(sv["n_ab"])
        acm = _m32(sv["n_ac"])
        n_waves, cf = fa.shape
        cn = na.shape[1]

        def body(i, carry, fa=fa, fb=fb, fc=fc, fbm=fbm, ffl=ffl, na=na, nb=nb,
                 nc=nc, ngid=ngid, nct=nct, aam=aam, abm=abm, acm=acm,
                 cf=cf, cn=cn):
            arena, cts = carry
            if cf:
                a = arena[_abs_idx(_row(fa, i), header_map, frame_base, H)]
                b = arena[_abs_idx(_row(fb, i), header_map, frame_base, H)]
                out = a ^ (b & _row(fbm, i)) ^ (d1 & _row(ffl, i))
                arena = arena.at[_dst_idx(_row(fc, i), frame_base)].set(out)
            if cn:
                a0 = arena[_abs_idx(_row(na, i), header_map, frame_base, H)]
                b0 = arena[_abs_idx(_row(nb, i), header_map, frame_base, H)]
                sel_a = a0 ^ (d1 & _row(aam, i))
                other_a = sel_a ^ d1
                hi, lo = _local_gid64(gid_hi, gid_lo, _row(ngid, i))
                h = _gate_hash2(sel_a, other_a, hi, lo, hasher)
                h_sel, h_other = h[:cn], h[cn:]
                b_sel = b0 ^ (d1 & _row(abm, i))
                ct = h_sel ^ h_other ^ b_sel
                w0 = h_sel ^ (d1 & _row(acm, i))
                arena = arena.at[_dst_idx(_row(nc, i), frame_base)].set(w0)
                cts = cts.at[_row(nct, i)].set(ct)
            return arena, cts

        if n_waves == 1:
            arena, cts = body(0, (arena, cts))
        else:
            arena, cts = jax.lax.fori_loop(0, n_waves, body, (arena, cts))
    return arena, cts[:-1]


def _evaluate_segs(arena, bits, cts_in, header_map, frame_base, gid_hi, gid_lo, segs, hasher="aes"):
    """Half-gates evaluation: arena (A, 4) active labels + bits (A,) uint8.

    One AES block per non-free gate; the evaluate AES batch is cn lanes, so
    classes being multiples of 16 means a cn=16 segment pads to 32 blocks
    inside ``_pad32``.
    """
    H = header_map.shape[0]
    max_ct = max(cts_in.shape[0] - 1, 0)
    for sv in segs:
        fa, fb, fc = sv["f_a"], sv["f_b"], sv["f_c"]
        fbm = _m32(sv["f_bmask"])
        fbm1 = sv["f_bmask"]
        ffl = sv["f_flip"]
        na, nb, nc = sv["n_a"], sv["n_b"], sv["n_c"]
        ngid, nct = sv["n_gid"], sv["n_ct"]
        naa, ntt = sv["n_aa"], sv["n_tt"]
        n_waves, cf = fa.shape
        cn = na.shape[1]

        def body(i, carry, fa=fa, fb=fb, fc=fc, fbm=fbm, fbm1=fbm1, ffl=ffl,
                 na=na, nb=nb, nc=nc, ngid=ngid, nct=nct, naa=naa, ntt=ntt,
                 cf=cf, cn=cn):
            arena, bits = carry
            if cf:
                ai = _abs_idx(_row(fa, i), header_map, frame_base, H)
                bi = _abs_idx(_row(fb, i), header_map, frame_base, H)
                la, lb = arena[ai], arena[bi]
                va, vb = bits[ai], bits[bi]
                out_l = la ^ (lb & _row(fbm, i))
                out_v = va ^ (vb & _row(fbm1, i)) ^ _row(ffl, i)
                ci = _dst_idx(_row(fc, i), frame_base)
                arena = arena.at[ci].set(out_l)
                bits = bits.at[ci].set(out_v)
            if cn:
                ai = _abs_idx(_row(na, i), header_map, frame_base, H)
                bi = _abs_idx(_row(nb, i), header_map, frame_base, H)
                la, lb = arena[ai], arena[bi]
                va, vb = bits[ai], bits[bi]
                hi, lo = _local_gid64(gid_hi, gid_lo, _row(ngid, i))
                h = _gate_hash1(la, hi, lo, hasher)
                ct = cts_in[jnp.clip(_row(nct, i), 0, max_ct)]
                use = (va != _row(naa, i))[:, None]
                out_l = jnp.where(use, ct ^ h ^ lb, h)
                tt = _row(ntt, i)
                out_v = ((tt >> (va * 2 + vb)) & 1).astype(jnp.uint8)
                ci = _dst_idx(_row(nc, i), frame_base)
                arena = arena.at[ci].set(out_l)
                bits = bits.at[ci].set(out_v)
            return arena, bits

        if n_waves == 1:
            arena, bits = body(0, (arena, bits))
        else:
            arena, bits = jax.lax.fori_loop(0, n_waves, body, (arena, bits))
    return arena, bits


def _scatter_outputs(arena, header_map, frame_base, outputs_map, out_ops):
    if out_ops.shape[0] == 0:
        return arena
    src = _abs_idx(out_ops, header_map, frame_base, header_map.shape[0])
    return arena.at[outputs_map].set(arena[src])


# ----------------------------------------------------------------------
# Group step bodies: S sites of one tape in a single program (see
# gsv_tpu.circuit.schedule).  Identical math to the per-step bodies with a
# leading site axis on maps/bases; the wave loop's lanes widen S-fold and
# the AES batch becomes S*cn blocks.  All statics derive from shapes.
# ----------------------------------------------------------------------


def _abs_idx_g(op_codes, header_maps, frame_bases, H: int):
    """(w,) operand codes -> (S, w) absolute arena indices."""
    ops = jnp.asarray(op_codes)
    hdr = header_maps[:, jnp.clip(ops, 0, H - 1)]
    return jnp.where(ops[None, :] < H, hdr, frame_bases[:, None] + ops[None, :] - H)


# Per-wave AES lane budget (batch * S * lane-width).  The remote TPU compiler
# crashes (helper subprocess exit 1) on programs whose single-wave hash
# working set reaches several GB — observed cliff between 4.2M lanes
# (compiles) and 16.8M (dies).  Waves wider than the budget are processed in
# power-of-two lane chunks by an inner fori_loop; intra-wave gates are
# independent by construction (dependency levels), so any split is sound.
_LANE_BUDGET = int(os.environ.get("GSV_LANE_BUDGET", 4 << 20))


def _chunk_factor(S: int, cn: int, lane_budget) -> int:
    """Static power-of-two chunk count k (dividing cn) with S*(cn/k) within
    budget.  k == 1 leaves the trace byte-identical to the unchunked form so
    existing compile-cache entries stay valid."""
    if not lane_budget:
        return 1
    k = 1
    while cn % (2 * k) == 0 and cn // k > 1 and S * (cn // k) > lane_budget:
        k *= 2
    return k


def _dst_idx_g(c_slots, frame_bases):
    return jnp.where(c_slots[None, :] < 0, _TRASH, frame_bases[:, None] + c_slots[None, :])


def _gid64_g(gid_hi, gid_lo, local):
    """(S,) bases + (w,) local ids -> (S, w) 64-bit gate ids."""
    lo = gid_lo[:, None] + jnp.asarray(local, dtype=jnp.uint32)[None, :]
    carry = (lo < gid_lo[:, None]).astype(jnp.uint32)
    hi = gid_hi[:, None] + carry
    return hi, lo


def _execute_group_segs(arena, header_maps, frame_bases, segs):
    H = header_maps.shape[1]
    for sv in segs:
        fa, fb, fc = sv["f_a"], sv["f_b"], sv["f_c"]
        fbm, ffl = sv["f_bmask"], sv["f_flip"]
        na, nb, nc = sv["n_a"], sv["n_b"], sv["n_c"]
        ntt = sv["n_tt"]
        n_waves, cf = fa.shape
        cn = na.shape[1]

        def body(i, arena, fa=fa, fb=fb, fc=fc, fbm=fbm, ffl=ffl, na=na,
                 nb=nb, nc=nc, ntt=ntt, cf=cf, cn=cn):
            if cf:
                a = arena[_abs_idx_g(_row(fa, i), header_maps, frame_bases, H)]
                b = arena[_abs_idx_g(_row(fb, i), header_maps, frame_bases, H)]
                out = a ^ (b & _row(fbm, i)[None, :]) ^ _row(ffl, i)[None, :]
                arena = arena.at[_dst_idx_g(_row(fc, i), frame_bases)].set(out)
            if cn:
                a = arena[_abs_idx_g(_row(na, i), header_maps, frame_bases, H)]
                b = arena[_abs_idx_g(_row(nb, i), header_maps, frame_bases, H)]
                tt = _row(ntt, i)[None, :]
                out = ((tt >> (a * 2 + b)) & 1).astype(jnp.uint8)
                arena = arena.at[_dst_idx_g(_row(nc, i), frame_bases)].set(out)
            return arena

        if n_waves == 1:
            arena = body(0, arena)
        else:
            arena = jax.lax.fori_loop(0, n_waves, body, arena)
    return arena


# Fat-tape site serialization: the remote TPU compiler dies (helper exit 1)
# on S>=2 group programs whose per-site ciphertext block is huge (observed:
# ctb=897,793 at S=2 crashes while the SAME tape at S=1 compiles) — the
# fused gather+hash+scatter over the multi-site buffer exceeds the
# compiler's working set.  For such programs, run the sites sequentially
# with an outer fori_loop whose body is exactly the proven S=1 program:
# sites of a group are independent by construction (schedule.py renaming),
# and ciphertext rows/gate-ids keep their original positions, so outputs,
# streams and digests are bit-identical to the unsplit form.  Wide fat-tape
# waves are compute-bound, so serializing 2-4 sites costs ~no wall clock.
_SITELOOP_CT_ROWS = int(os.environ.get("GSV_SITELOOP_CT", 200_000))


def _garble_group_segs(arena, ct_token, header_maps, frame_bases, delta,
                       gid_hi, gid_lo, ct_loc, segs, hasher="aes",
                       lane_budget=None):
    cts = jnp.zeros((ct_token.shape[0], 4), jnp.uint32)
    S = header_maps.shape[0]
    ctb = (ct_token.shape[0] - 1) // max(S, 1)
    if S > 1 and ctb > _SITELOOP_CT_ROWS:
        def site(s, carry):
            a, c = carry
            sl = lambda arr: jax.lax.dynamic_slice_in_dim(arr, s, 1, 0)
            return _garble_group_segs_into(
                a, c, sl(header_maps), sl(frame_bases), delta,
                sl(gid_hi), sl(gid_lo), sl(ct_loc), segs, hasher, lane_budget)
        return jax.lax.fori_loop(0, S, site, (arena, cts))
    return _garble_group_segs_into(arena, cts, header_maps, frame_bases,
                                   delta, gid_hi, gid_lo, ct_loc, segs,
                                   hasher, lane_budget)


def _garble_group_segs_into(arena, cts, header_maps, frame_bases, delta,
                            gid_hi, gid_lo, ct_loc, segs, hasher="aes",
                            lane_budget=None):
    """Half-gates garbling over S sites.  Ciphertext buffer rows are
    ``S * ctb + 1``: site s's stream slice lives at ``[s*ctb, s*ctb+ct)``,
    rows ``[s*ctb+ct, (s+1)*ctb)`` stay zero (deterministic), the last row
    absorbs padded lanes and padded sites."""
    H = header_maps.shape[1]
    S = header_maps.shape[0]
    trash_row = cts.shape[0] - 1
    d1 = delta[None, None, :]
    for sv in segs:
        fa, fb, fc = sv["f_a"], sv["f_b"], sv["f_c"]
        fbm = _m32(sv["f_bmask"])
        ffl = _m32(sv["f_flip"])
        na, nb, nc = sv["n_a"], sv["n_b"], sv["n_c"]
        ngid, nct = sv["n_gid"], sv["n_ct"]
        aam = _m32(sv["n_aa"])
        abm = _m32(sv["n_ab"])
        acm = _m32(sv["n_ac"])
        n_waves, cf = fa.shape
        cn = na.shape[1]

        def body(i, carry, fa=fa, fb=fb, fc=fc, fbm=fbm, ffl=ffl, na=na,
                 nb=nb, nc=nc, ngid=ngid, nct=nct, aam=aam, abm=abm, acm=acm,
                 cf=cf, cn=cn):
            arena, cts = carry
            if cf:
                a = arena[_abs_idx_g(_row(fa, i), header_maps, frame_bases, H)]
                b = arena[_abs_idx_g(_row(fb, i), header_maps, frame_bases, H)]
                out = a ^ (b & _row(fbm, i)[None]) ^ (d1 & _row(ffl, i)[None])
                arena = arena.at[_dst_idx_g(_row(fc, i), frame_bases)].set(out)
            if cn:
                k = _chunk_factor(S, cn, lane_budget)

                def nonfree(na_r, nb_r, nc_r, gid_r, ct_r, aa_r, ab_r, ac_r,
                            arena, cts, C=cn // k):
                    a0 = arena[_abs_idx_g(na_r, header_maps, frame_bases, H)]
                    b0 = arena[_abs_idx_g(nb_r, header_maps, frame_bases, H)]
                    sel_a = a0 ^ (d1 & aa_r[None])
                    other_a = sel_a ^ d1
                    hi, lo = _gid64_g(gid_hi, gid_lo, gid_r)
                    h = _gate_hash2(
                        sel_a.reshape(S * C, 4), other_a.reshape(S * C, 4),
                        hi.reshape(-1), lo.reshape(-1), hasher,
                    )
                    h_sel = h[: S * C].reshape(S, C, 4)
                    h_other = h[S * C :].reshape(S, C, 4)
                    b_sel = b0 ^ (d1 & ab_r[None])
                    ct = h_sel ^ h_other ^ b_sel
                    w0 = h_sel ^ (d1 & ac_r[None])
                    arena = arena.at[_dst_idx_g(nc_r, frame_bases)].set(w0)
                    nr = ct_r[None, :]
                    idx = jnp.where(nr < 0, trash_row, ct_loc[:, None] + nr)
                    idx = jnp.minimum(idx, trash_row)
                    cts = cts.at[idx].set(ct)
                    return arena, cts

                if k == 1:
                    arena, cts = nonfree(
                        _row(na, i), _row(nb, i), _row(nc, i), _row(ngid, i),
                        _row(nct, i), _row(aam, i), _row(abm, i), _row(acm, i),
                        arena, cts,
                    )
                else:
                    C = cn // k
                    naw = _row(na, i).reshape(k, C)
                    nbw = _row(nb, i).reshape(k, C)
                    ncw = _row(nc, i).reshape(k, C)
                    gidw = _row(ngid, i).reshape(k, C)
                    nctw = _row(nct, i).reshape(k, C)
                    aaw = _row(aam, i).reshape(k, C, 1)
                    abw = _row(abm, i).reshape(k, C, 1)
                    acw = _row(acm, i).reshape(k, C, 1)

                    def inner(j, carry):
                        return nonfree(
                            _row(naw, j), _row(nbw, j), _row(ncw, j),
                            _row(gidw, j), _row(nctw, j), _row(aaw, j),
                            _row(abw, j), _row(acw, j), *carry,
                        )

                    arena, cts = jax.lax.fori_loop(0, k, inner, (arena, cts))
            return arena, cts

        if n_waves == 1:
            arena, cts = body(0, (arena, cts))
        else:
            arena, cts = jax.lax.fori_loop(0, n_waves, body, (arena, cts))
    return arena, cts


def _evaluate_group_segs(arena, bits, cts_in, header_maps, frame_bases,
                         gid_hi, gid_lo, ct_loc, segs, hasher="aes",
                         lane_budget=None):
    S = header_maps.shape[0]
    ctb = max(cts_in.shape[0] - 1, 0) // max(S, 1)
    if S > 1 and ctb > _SITELOOP_CT_ROWS:
        def site(s, carry):
            a, b = carry
            sl = lambda arr: jax.lax.dynamic_slice_in_dim(arr, s, 1, 0)
            return _evaluate_group_segs_into(
                a, b, cts_in, sl(header_maps), sl(frame_bases),
                sl(gid_hi), sl(gid_lo), sl(ct_loc), segs, hasher, lane_budget)
        return jax.lax.fori_loop(0, S, site, (arena, bits))
    return _evaluate_group_segs_into(arena, bits, cts_in, header_maps,
                                     frame_bases, gid_hi, gid_lo, ct_loc,
                                     segs, hasher, lane_budget)


def _evaluate_group_segs_into(arena, bits, cts_in, header_maps, frame_bases,
                              gid_hi, gid_lo, ct_loc, segs, hasher="aes",
                              lane_budget=None):
    H = header_maps.shape[1]
    S = header_maps.shape[0]
    max_ct = max(cts_in.shape[0] - 1, 0)
    for sv in segs:
        fa, fb, fc = sv["f_a"], sv["f_b"], sv["f_c"]
        fbm = _m32(sv["f_bmask"])
        fbm1 = sv["f_bmask"]
        ffl = sv["f_flip"]
        na, nb, nc = sv["n_a"], sv["n_b"], sv["n_c"]
        ngid, nct = sv["n_gid"], sv["n_ct"]
        naa, ntt = sv["n_aa"], sv["n_tt"]
        n_waves, cf = fa.shape
        cn = na.shape[1]

        def body(i, carry, fa=fa, fb=fb, fc=fc, fbm=fbm, fbm1=fbm1, ffl=ffl,
                 na=na, nb=nb, nc=nc, ngid=ngid, nct=nct, naa=naa, ntt=ntt,
                 cf=cf, cn=cn):
            arena, bits = carry
            if cf:
                ai = _abs_idx_g(_row(fa, i), header_maps, frame_bases, H)
                bi = _abs_idx_g(_row(fb, i), header_maps, frame_bases, H)
                la, lb = arena[ai], arena[bi]
                va, vb = bits[ai], bits[bi]
                out_l = la ^ (lb & _row(fbm, i)[None])
                out_v = va ^ (vb & _row(fbm1, i)[None]) ^ _row(ffl, i)[None]
                ci = _dst_idx_g(_row(fc, i), frame_bases)
                arena = arena.at[ci].set(out_l)
                bits = bits.at[ci].set(out_v)
            if cn:
                k = _chunk_factor(S, cn, lane_budget)

                def nonfree(na_r, nb_r, nc_r, gid_r, ct_r, aa_r, tt_r,
                            arena, bits, C=cn // k):
                    ai = _abs_idx_g(na_r, header_maps, frame_bases, H)
                    bi = _abs_idx_g(nb_r, header_maps, frame_bases, H)
                    la, lb = arena[ai], arena[bi]
                    va, vb = bits[ai], bits[bi]
                    hi, lo = _gid64_g(gid_hi, gid_lo, gid_r)
                    h = _gate_hash1(
                        la.reshape(S * C, 4), hi.reshape(-1), lo.reshape(-1), hasher
                    ).reshape(S, C, 4)
                    nr = ct_r[None, :]
                    idx = jnp.where(nr < 0, max_ct, ct_loc[:, None] + nr)
                    ct = cts_in[jnp.clip(idx, 0, max_ct)]
                    use = (va != aa_r[None])[..., None]
                    out_l = jnp.where(use, ct ^ h ^ lb, h)
                    tt = tt_r[None]
                    out_v = ((tt >> (va * 2 + vb)) & 1).astype(jnp.uint8)
                    ci = _dst_idx_g(nc_r, frame_bases)
                    arena = arena.at[ci].set(out_l)
                    bits = bits.at[ci].set(out_v)
                    return arena, bits

                if k == 1:
                    arena, bits = nonfree(
                        _row(na, i), _row(nb, i), _row(nc, i), _row(ngid, i),
                        _row(nct, i), _row(naa, i), _row(ntt, i), arena, bits,
                    )
                else:
                    C = cn // k
                    naw = _row(na, i).reshape(k, C)
                    nbw = _row(nb, i).reshape(k, C)
                    ncw = _row(nc, i).reshape(k, C)
                    gidw = _row(ngid, i).reshape(k, C)
                    nctw = _row(nct, i).reshape(k, C)
                    naaw = _row(naa, i).reshape(k, C)
                    nttw = _row(ntt, i).reshape(k, C)

                    def inner(j, carry):
                        return nonfree(
                            _row(naw, j), _row(nbw, j), _row(ncw, j),
                            _row(gidw, j), _row(nctw, j), _row(naaw, j),
                            _row(nttw, j), *carry,
                        )

                    arena, bits = jax.lax.fori_loop(0, k, inner, (arena, bits))
            return arena, bits

        if n_waves == 1:
            arena, bits = body(0, (arena, bits))
        else:
            arena, bits = jax.lax.fori_loop(0, n_waves, body, (arena, bits))
    return arena, bits


def _scatter_outputs_g(arena, header_maps, frame_bases, outputs_maps, out_ops):
    if out_ops.shape[0] == 0:
        return arena
    src = _abs_idx_g(out_ops, header_maps, frame_bases, header_maps.shape[1])
    return arena.at[outputs_maps].set(arena[src])


# ----------------------------------------------------------------------
# Word-major ("wm") garble path.  The standard arena is (..., slots, 4):
# a 4-wide minor dim on a 128-lane machine, so every gather/scatter and
# the AES feed transpose run at a fraction of line rate (r5 probes:
# in-situ wave 0.14 B blocks/s row-major vs 0.25 B word-major;
# scripts/probe_wm_layout.py).  Here the arena is (4, B, slots) — batch
# INSIDE, slots minor — so gathers are per-word-row 1D gathers, the AES
# feed (4, B, S, C) -> (4, B*S*C) is a free contiguous reshape into the
# strided wt layout (ops/aes_pallas.aes_encrypt_wm), and free-XOR waves
# run on lane-major data.  Labels, ciphertexts and the digest are
# bit-identical to the standard path (AES is per-block elementwise; the
# digest fold is associative XOR) — pinned by tests/test_wm.py.
# Garble-only (the headline cts-free committed pass); hasher "aes_wm".
# ----------------------------------------------------------------------


def _aes_blocks_wm(blocks_wm, min_blocks: int):
    """Fixed-key AES over word-major (4, n) blocks."""
    n = blocks_wm.shape[1]
    if n >= min_blocks:
        from gsv_tpu.core.hw import tpu_available
        from gsv_tpu.ops.aes_pallas import aes_encrypt_wm

        return aes_encrypt_wm(blocks_wm, interpret=not tpu_available())
    # narrow wave: the XLA bitsliced path via an explicit (small) transpose
    return aes_encrypt_words(blocks_wm.T, xp=jnp).T


def _gate_hash2_wm(sel_a, other_a, hi, lo, B: int, min_blocks: int):
    """Hash both a-labels, word-major: inputs (4B, lanes) with row j*B+b =
    word j of instance b; tweaks per lane — mirrors _gate_hash2 exactly."""
    from gsv_tpu.ops.tweaks import tweak_words_wm

    tw = tweak_words_wm(hi, lo, xp=jnp)  # (4, lanes)
    lanes = sel_a.shape[1]
    sel4 = sel_a.reshape(4, B * lanes)  # free: row-major (4B, L) split
    oth4 = other_a.reshape(4, B * lanes)
    twf = jnp.broadcast_to(tw[:, None, :], (4, B, lanes)).reshape(4, -1)
    blocks = jnp.concatenate([sel4 ^ twf, oth4 ^ twf], axis=1)
    m = blocks.shape[1]
    padn = (-m) % 32
    if padn:
        blocks = jnp.concatenate(
            [blocks, jnp.zeros((4, padn), jnp.uint32)], axis=1)
        h = _aes_blocks_wm(blocks, min_blocks)[:, :m]
    else:
        h = _aes_blocks_wm(blocks, min_blocks)
    BL = B * lanes
    # split BEFORE flattening back to (4B, lanes): sel columns [0, BL) and
    # other columns [BL, 2BL) are b-major within each word row
    return (h[:, :BL].reshape(4 * B, lanes),
            h[:, BL:].reshape(4 * B, lanes))


def _digest_update_wm(digest, cts, group_id, B: int, min_blocks: int):
    """XOR-fold commitment over word-major cts (4B, rows+1): identical
    values to _digest_update (same per-row AES, associative XOR fold)."""
    from gsv_tpu.ops.tweaks import tweak_words_wm

    rows = cts.shape[1] - 1
    if rows == 0:
        return digest
    gids = jnp.full((rows,), group_id, jnp.uint32)
    idx = jnp.arange(rows, dtype=jnp.uint32)
    tw = tweak_words_wm(gids, idx, xp=jnp)  # (4, rows)
    body = cts[:, :rows].reshape(4, B, rows) ^ tw[:, None, :]
    blocks = body.reshape(4, B * rows)
    padn = (-(B * rows)) % 32
    if padn:
        blocks = jnp.concatenate(
            [blocks, jnp.zeros((4, padn), jnp.uint32)], axis=1)
    h = _aes_blocks_wm(blocks, min_blocks)[:, : B * rows]
    fold = jax.lax.reduce(h.reshape(4 * B, rows), jnp.uint32(0),
                          jax.lax.bitwise_xor, dimensions=(1,))
    return digest ^ fold


def _garble_group_segs_wm(arena, cts, header_maps, frame_bases, delta,
                          gid_hi, gid_lo, ct_loc, segs, B: int,
                          min_blocks: int, lane_budget=None):
    """Half-gates garbling over S sites, word-major arena (4B, A).

    Row j*B+b holds word j of instance b — a single 128-row leading dim at
    B=32, which tiles perfectly (a (4, B, A) form made XLA pad the 32-dim
    to 128 lanes: 3.7x HBM, r5).  Mirrors _garble_group_segs_into wave for
    wave; the ciphertext buffer is (4B, S*ctb+1)."""
    H = header_maps.shape[1]
    S = header_maps.shape[0]
    trash_row = cts.shape[1] - 1
    d1 = delta[:, None, None]  # (4B, 1, 1)
    for sv in segs:
        fa, fb, fc = sv["f_a"], sv["f_b"], sv["f_c"]
        fbm = _m32(sv["f_bmask"])
        ffl = _m32(sv["f_flip"])
        na, nb, nc = sv["n_a"], sv["n_b"], sv["n_c"]
        ngid, nct = sv["n_gid"], sv["n_ct"]
        aam = _m32(sv["n_aa"])
        abm = _m32(sv["n_ab"])
        acm = _m32(sv["n_ac"])
        n_waves, cf = fa.shape
        cn = na.shape[1]

        def body(i, carry, fa=fa, fb=fb, fc=fc, fbm=fbm, ffl=ffl, na=na,
                 nb=nb, nc=nc, ngid=ngid, nct=nct, aam=aam, abm=abm, acm=acm,
                 cf=cf, cn=cn):
            arena, cts = carry
            if cf:
                ia = _abs_idx_g(_row(fa, i), header_maps, frame_bases, H)
                ib = _abs_idx_g(_row(fb, i), header_maps, frame_bases, H)
                a = arena[:, ia]  # (4B, S, cf)
                b = arena[:, ib]
                mb = _row(fbm, i).reshape(1, 1, -1)
                mf = _row(ffl, i).reshape(1, 1, -1)
                out = a ^ (b & mb) ^ (d1 & mf)
                arena = arena.at[:, _dst_idx_g(_row(fc, i), frame_bases)
                                 ].set(out)
            if cn:
                k = _chunk_factor(S, cn, lane_budget)

                def nonfree(na_r, nb_r, nc_r, gid_r, ct_r, aa_r, ab_r, ac_r,
                            arena, cts, C=cn // k):
                    ia = _abs_idx_g(na_r, header_maps, frame_bases, H)
                    ib = _abs_idx_g(nb_r, header_maps, frame_bases, H)
                    a0 = arena[:, ia]  # (4B, S, C)
                    b0 = arena[:, ib]
                    maa = aa_r.reshape(1, 1, -1)
                    mab = ab_r.reshape(1, 1, -1)
                    mac = ac_r.reshape(1, 1, -1)
                    sel_a = a0 ^ (d1 & maa)
                    other_a = sel_a ^ d1
                    hi, lo = _gid64_g(gid_hi, gid_lo, gid_r)
                    h_sel, h_other = _gate_hash2_wm(
                        sel_a.reshape(4 * B, S * C),
                        other_a.reshape(4 * B, S * C),
                        hi.reshape(-1), lo.reshape(-1), B, min_blocks,
                    )
                    h_sel = h_sel.reshape(4 * B, S, C)
                    h_other = h_other.reshape(4 * B, S, C)
                    b_sel = b0 ^ (d1 & mab)
                    ct = h_sel ^ h_other ^ b_sel
                    w0 = h_sel ^ (d1 & mac)
                    arena = arena.at[:, _dst_idx_g(nc_r, frame_bases)
                                     ].set(w0)
                    nr = ct_r[None, :]
                    idx = jnp.where(nr < 0, trash_row, ct_loc[:, None] + nr)
                    idx = jnp.minimum(idx, trash_row)
                    cts = cts.at[:, idx].set(ct)
                    return arena, cts

                if k == 1:
                    arena, cts = nonfree(
                        _row(na, i), _row(nb, i), _row(nc, i), _row(ngid, i),
                        _row(nct, i), _row(aam, i), _row(abm, i), _row(acm, i),
                        arena, cts,
                    )
                else:
                    C = cn // k
                    naw = _row(na, i).reshape(k, C)
                    nbw = _row(nb, i).reshape(k, C)
                    ncw = _row(nc, i).reshape(k, C)
                    gidw = _row(ngid, i).reshape(k, C)
                    nctw = _row(nct, i).reshape(k, C)
                    aaw = _row(aam, i).reshape(k, C, 1)
                    abw = _row(abm, i).reshape(k, C, 1)
                    acw = _row(acm, i).reshape(k, C, 1)

                    def inner(j, carry):
                        return nonfree(
                            _row(naw, j), _row(nbw, j), _row(ncw, j),
                            _row(gidw, j), _row(nctw, j), _row(aaw, j),
                            _row(abw, j), _row(acw, j), *carry,
                        )

                    arena, cts = jax.lax.fori_loop(0, k, inner, (arena, cts))
            return arena, cts

        if n_waves == 1:
            arena, cts = body(0, (arena, cts))
        else:
            arena, cts = jax.lax.fori_loop(0, n_waves, body, (arena, cts))
    return arena, cts


def _scatter_outputs_g_wm(arena, header_maps, frame_bases, outputs_maps,
                          out_ops):
    if out_ops.shape[0] == 0:
        return arena
    src = _abs_idx_g(out_ops, header_maps, frame_bases, header_maps.shape[1])
    return arena.at[:, outputs_maps].set(arena[:, src])


def _digest_update(digest, cts, group_id, hasher="aes"):
    """TPU-native streaming commitment: XOR-accumulate fixed-key AES over
    position-tweaked ciphertext rows (tweak = (group_id, row)).  Replaces the
    reference's sequential chain h <- AES(h ^ ct) (ciphertext_hasher.rs:16-33)
    with an associative reduction the device can do in bulk; both protocol
    parties compute it over the same deterministic buffer layout, so it
    serves the same consistency-check role."""
    rows = cts.shape[0] - 1  # exclude the trash row (scatter-order dependent)
    if rows == 0:
        return digest
    return _digest_update_rows(digest, cts[:rows], group_id, 0, hasher)


def _digest_update_rows(digest, body, group_id, row0, hasher="aes"):
    """Fold ``body`` rows with tweaks starting at global row ``row0``.  The
    XOR fold is associative, so devices holding disjoint row blocks of one
    group's buffer can fold locally with their global offsets and combine
    (gsv_tpu.parallel.intra site-sharded garbling).

    ``row0`` may be a traced scalar; the static-0 case MUST skip the add so
    the emitted HLO stays byte-identical to the pre-r3 fold — group-program
    compile-cache keys hash the HLO, and a gratuitous ``0 +`` op invalidates
    the whole 82-program fill (burned ~40min of remote compiles once)."""
    rows = body.shape[0]
    if rows == 0:
        return digest
    # op order (full THEN iota, no add for static row0=0) must match the
    # pre-r3 trace byte-for-byte — see docstring
    gids = jnp.full((rows,), group_id, jnp.uint32)
    idx = jnp.arange(rows, dtype=jnp.uint32)
    if not (isinstance(row0, int) and row0 == 0):
        idx = row0 + idx
    tw = tweak_words(gids, idx, xp=jnp)
    blocks, _ = _pad32(body ^ tw)
    h = _aes_blocks(blocks, hasher)[:rows]
    fold = jax.lax.reduce(h, jnp.uint32(0), jax.lax.bitwise_xor, dimensions=(0,))
    return digest ^ fold


# ----------------------------------------------------------------------
# Module-level generic jit cache: ONE jit object per (mode, hasher, batch)
# shared by every PlanExecutor in the process; XLA's aval cache then keys
# compilations by shape signature only.
# ----------------------------------------------------------------------

_GENERIC_JITS: dict = {}


def _generic_jit(mode: str, hasher: str, batch: int | None):
    key = (mode, hasher, batch)
    fn = _GENERIC_JITS.get(key)
    if fn is not None:
        return fn
    hasher = _pallas_hasher_tag(hasher, batch)

    if mode == "execute":

        def step(arena, header_map, outputs_map, out_ops, frame_base, segs):
            arena = _execute_segs(arena, header_map, frame_base, segs)
            return _scatter_outputs(arena, header_map, frame_base, outputs_map, out_ops)

        if batch:
            step = jax.vmap(step, in_axes=(0, None, None, None, None, None))
        fn = jax.jit(step, donate_argnums=(0,))
    elif mode == "garble":

        def step(arena, ct_token, header_map, outputs_map, out_ops, frame_base,
                 delta, gid_hi, gid_lo, segs):
            arena, cts = _garble_segs(
                arena, ct_token, header_map, frame_base, delta, gid_hi, gid_lo,
                segs, hasher=hasher,
            )
            arena = _scatter_outputs(arena, header_map, frame_base, outputs_map, out_ops)
            return arena, cts

        if batch:
            step = jax.vmap(
                step, in_axes=(0, None, None, None, None, None, 0, None, None, None)
            )
        fn = jax.jit(step, donate_argnums=(0,))
    elif mode == "evaluate":

        def step(arena, bits, cts_in, header_map, outputs_map, out_ops,
                 frame_base, gid_hi, gid_lo, segs):
            arena, bits = _evaluate_segs(
                arena, bits, cts_in, header_map, frame_base, gid_hi, gid_lo,
                segs, hasher=hasher,
            )
            if out_ops.shape[0]:
                src = _abs_idx(out_ops, header_map, frame_base, header_map.shape[0])
                arena = arena.at[outputs_map].set(arena[src])
                bits = bits.at[outputs_map].set(bits[src])
            return arena, bits

        if batch:
            step = jax.vmap(
                step, in_axes=(0, 0, 0, None, None, None, None, None, None, None)
            )
        fn = jax.jit(step, donate_argnums=(0, 1))
    else:
        raise ValueError(mode)

    _GENERIC_JITS[key] = fn
    return fn


_GROUP_JITS: dict = {}


def _generic_group_jit_wm(batch: int | None):
    """Jitted standalone word-major garble-nocts group program (used by
    mega_garble for residual excluded-signature dispatches)."""
    key = ("garble_wm", batch)
    fn = _GROUP_JITS.get(key)
    if fn is None:
        step = _group_step_fn_wm(batch, commit=True)
        fn = jax.jit(step, donate_argnums=(0, 10))
        _GROUP_JITS[key] = fn
    return fn


def _packed_group_jit(mode: str, hasher: str, batch: int | None, commit: bool,
                      emit_cts: bool, layout):
    """Packed-segs variant of ``_generic_group_jit``: the ~14-arrays-per-
    segment pytree is replaced by two pooled buffers + a static ``layout``
    (see pack_seg_args).  One jit object per layout — layouts number the
    distinct tape signatures (~82 on the full verifier), so this stays
    small while the per-dispatch leaf count drops ~9x."""
    key = ("p", mode, hasher, batch, commit, emit_cts, layout)
    hasher = _pallas_hasher_tag(hasher, batch)
    fn = _GROUP_JITS.get(key)
    if fn is not None:
        return fn
    base = _group_step_fn(mode, hasher, batch, commit, emit_cts)

    if mode == "garble":

        def step(arena, ct_token, header_maps, outputs_maps, out_ops,
                 frame_bases, delta, gid_hi, gid_lo, ct_loc, digest,
                 group_id, pool32, pool8):
            segs = unpack_seg_views(pool32, pool8, layout)
            return base(arena, ct_token, header_maps, outputs_maps, out_ops,
                        frame_bases, delta, gid_hi, gid_lo, ct_loc, digest,
                        group_id, segs)

        if batch:
            step = jax.vmap(
                step,
                in_axes=(0, None, None, None, None, None, 0, None, None,
                         None, 0, None, None, None),
            )
        fn = jax.jit(step, donate_argnums=(0, 10))
    elif mode == "evaluate":

        def step(arena, bits, cts_in, header_maps, outputs_maps, out_ops,
                 frame_bases, gid_hi, gid_lo, ct_loc, digest, group_id,
                 pool32, pool8):
            segs = unpack_seg_views(pool32, pool8, layout)
            return base(arena, bits, cts_in, header_maps, outputs_maps,
                        out_ops, frame_bases, gid_hi, gid_lo, ct_loc,
                        digest, group_id, segs)

        if batch:
            step = jax.vmap(
                step,
                in_axes=(0, 0, 0, None, None, None, None, None, None, None,
                         0, None, None, None),
            )
        fn = jax.jit(step, donate_argnums=(0, 1, 10))
    else:  # execute

        def step(arena, header_maps, outputs_maps, out_ops, frame_bases,
                 pool32, pool8):
            segs = unpack_seg_views(pool32, pool8, layout)
            return base(arena, header_maps, outputs_maps, out_ops,
                        frame_bases, segs)

        if batch:
            step = jax.vmap(step, in_axes=(0, None, None, None, None, None, None))
        fn = jax.jit(step, donate_argnums=(0,))

    _GROUP_JITS[key] = fn
    return fn


def _group_step_fn_wm(batch: int | None, commit: bool = True):
    """Word-major garble-nocts group step (see _garble_group_segs_wm).

    Takes/returns the arena as (4B, A) with batch folded into the 128-row
    leading dim (no vmap); call signature otherwise mirrors the garble
    step: (arena, ct_token, header_maps, outputs_maps, out_ops,
    frame_bases, delta(4B,), gid_hi, gid_lo, ct_loc, digest(4B,),
    group_id, segs)."""
    B = batch or 1
    lane_budget = max(
        1, int(os.environ.get("GSV_LANE_BUDGET_WM", _LANE_BUDGET)) // B)
    min_blocks = _PALLAS_MIN_BLOCKS

    def step(arena, ct_token, header_maps, outputs_maps, out_ops,
             frame_bases, delta, gid_hi, gid_lo, ct_loc, digest,
             group_id, segs):
        tr = ct_token.shape[0]
        cts = jnp.zeros((4 * B, tr), jnp.uint32)
        arena, cts = _garble_group_segs_wm(
            arena, cts, header_maps, frame_bases, delta, gid_hi, gid_lo,
            ct_loc, segs, B, min_blocks, lane_budget=lane_budget)
        arena = _scatter_outputs_g_wm(arena, header_maps, frame_bases,
                                      outputs_maps, out_ops)
        if commit:
            digest = _digest_update_wm(digest, cts, group_id, B, min_blocks)
        return arena, digest

    return step


def _group_step_fn(mode: str, hasher: str, batch: int | None, commit: bool,
                   emit_cts: bool):
    """The un-jitted, un-vmapped group step body shared by the plain and
    packed jit wrappers."""
    lane_budget = max(1, _LANE_BUDGET // max(batch or 1, 1))

    if mode == "execute":

        def step(arena, header_maps, outputs_maps, out_ops, frame_bases, segs):
            arena = _execute_group_segs(arena, header_maps, frame_bases, segs)
            return _scatter_outputs_g(arena, header_maps, frame_bases,
                                      outputs_maps, out_ops)

        return step
    if mode == "garble":

        def step(arena, ct_token, header_maps, outputs_maps, out_ops,
                 frame_bases, delta, gid_hi, gid_lo, ct_loc, digest,
                 group_id, segs):
            arena, cts = _garble_group_segs(
                arena, ct_token, header_maps, frame_bases, delta,
                gid_hi, gid_lo, ct_loc, segs, hasher=hasher,
                lane_budget=lane_budget,
            )
            arena = _scatter_outputs_g(arena, header_maps, frame_bases,
                                       outputs_maps, out_ops)
            if commit:
                digest = _digest_update(digest, cts, group_id, hasher)
            if not emit_cts:
                return arena, digest
            return arena, cts, digest

        return step
    if mode == "evaluate":

        def step(arena, bits, cts_in, header_maps, outputs_maps, out_ops,
                 frame_bases, gid_hi, gid_lo, ct_loc, digest, group_id, segs):
            arena, bits = _evaluate_group_segs(
                arena, bits, cts_in, header_maps, frame_bases,
                gid_hi, gid_lo, ct_loc, segs, hasher=hasher,
                lane_budget=lane_budget,
            )
            if out_ops.shape[0]:
                src = _abs_idx_g(out_ops, header_maps, frame_bases,
                                 header_maps.shape[1])
                arena = arena.at[outputs_maps].set(arena[src])
                bits = bits.at[outputs_maps].set(bits[src])
            if commit:
                digest = _digest_update(digest, cts_in, group_id, hasher)
            return arena, bits, digest

        return step
    raise ValueError(mode)


def _generic_group_jit(mode: str, hasher: str, batch: int | None, commit: bool = False,
                       emit_cts: bool = True):
    """``emit_cts=False`` (garble only, requires commit): the program
    returns (arena, digest) and the ciphertext buffer stays internal —
    freed at program end instead of held by every queued dispatch.  This
    is the deep-pipeline configuration for handler-less committed garbling
    (the cut-and-choose create/audit passes): with cts as an output, ~40
    pending dispatches hold ~2GB of HBM and the full-verifier pass OOMs,
    while throttling to a safe depth serializes on the tunnel RTT."""
    key = ("g", mode, hasher, batch, commit, emit_cts)
    hasher = _pallas_hasher_tag(hasher, batch)
    fn = _GROUP_JITS.get(key)
    if fn is not None:
        return fn
    # hash working-set cap per wave, shared across the batch axis
    lane_budget = max(1, _LANE_BUDGET // max(batch or 1, 1))

    if mode == "execute":

        def step(arena, header_maps, outputs_maps, out_ops, frame_bases, segs):
            arena = _execute_group_segs(arena, header_maps, frame_bases, segs)
            return _scatter_outputs_g(arena, header_maps, frame_bases, outputs_maps, out_ops)

        if batch:
            step = jax.vmap(step, in_axes=(0, None, None, None, None, None))
        fn = jax.jit(step, donate_argnums=(0,))
    elif mode == "garble":

        def step(arena, ct_token, header_maps, outputs_maps, out_ops,
                 frame_bases, delta, gid_hi, gid_lo, ct_loc, digest, group_id, segs):
            arena, cts = _garble_group_segs(
                arena, ct_token, header_maps, frame_bases, delta,
                gid_hi, gid_lo, ct_loc, segs, hasher=hasher,
                lane_budget=lane_budget,
            )
            arena = _scatter_outputs_g(arena, header_maps, frame_bases, outputs_maps, out_ops)
            if commit:
                digest = _digest_update(digest, cts, group_id, hasher)
            if not emit_cts:
                return arena, digest
            return arena, cts, digest

        if not emit_cts:
            assert commit, "digest is the only observable without cts"
        if batch:
            step = jax.vmap(
                step,
                in_axes=(0, None, None, None, None, None, 0, None, None, None, 0, None, None),
            )
        fn = jax.jit(step, donate_argnums=(0, 10))
    elif mode == "evaluate":

        def step(arena, bits, cts_in, header_maps, outputs_maps, out_ops,
                 frame_bases, gid_hi, gid_lo, ct_loc, digest, group_id, segs):
            arena, bits = _evaluate_group_segs(
                arena, bits, cts_in, header_maps, frame_bases,
                gid_hi, gid_lo, ct_loc, segs, hasher=hasher,
                lane_budget=lane_budget,
            )
            if out_ops.shape[0]:
                src = _abs_idx_g(out_ops, header_maps, frame_bases, header_maps.shape[1])
                arena = arena.at[outputs_maps].set(arena[src])
                bits = bits.at[outputs_maps].set(bits[src])
            if commit:
                # same fold as garble over the SAME buffer layout, so the
                # evaluator's digest of the stream it actually consumed can
                # be checked against the garbler's commitment
                digest = _digest_update(digest, cts_in, group_id, hasher)
            return arena, bits, digest

        if batch:
            step = jax.vmap(
                step,
                in_axes=(0, 0, 0, None, None, None, None, None, None, None, 0, None, None),
            )
        fn = jax.jit(step, donate_argnums=(0, 1, 10))
    else:
        raise ValueError(mode)

    _GROUP_JITS[key] = fn
    return fn


class GroupExecutor:
    """Runs a GroupPlan (gsv_tpu.circuit.schedule) in execute/garble/evaluate.

    Same math and bit-exact streams as PlanExecutor (per-site gate-id and
    ciphertext bases are the sequential ones); dispatches and sequential
    waves shrink by the grouping factor.  ``commit=True`` additionally
    maintains a running device-side stream digest (see _digest_update).
    """

    def __init__(self, gplan, batch: int | None = None, hasher: str = "aes",
                 mesh=None, arena_size: int | None = None):
        """``mesh``: optional Mesh with an ``instances`` axis — the batched
        state (arenas, deltas, digests) is laid out across it and every
        group program runs SPMD; XLA propagates the sharding through the
        whole pass, so instances scale across chips with zero per-step
        logic (SURVEY §2.7 instance data-parallelism).

        ``arena_size``: allocate the slot arena LARGER than the plan needs
        (must be >= gplan.arena_size).  Program compilations are keyed by
        array shapes, and every remote TPU compile costs 20-60s — running
        two plans (e.g. the uniform and compressed verifiers) at one shared
        arena size lets them reuse each other's compiled group programs for
        every (tape signature, S-bucket) they have in common."""
        assert hasher in ("aes", "aes_pallas", "aes_pallas2", "aes_wm",
                          "blake3")
        self.plan = gplan
        self.batch = batch
        self.hasher = hasher
        self.mesh = mesh
        self.arena_size = max(arena_size or 0, gplan.arena_size)
        # GSV_PACKED_SEGS=1: ship each tape's segment arrays as two pooled
        # buffers instead of ~125 leaves (pack_seg_args) — ~9x lower
        # per-dispatch marshaling through the tunneled client.  Changes the
        # traced programs, so it needs its own compile-cache fill.
        self.packed = os.environ.get("GSV_PACKED_SEGS", "0") == "1"
        self._dev: dict = {}

    def _shard(self, arr):
        """Lay a batched array across the instances mesh axis (no-op
        without a mesh)."""
        if self.mesh is None or self.batch is None:
            return h2d(arr)
        from gsv_tpu.parallel.sharding import shard_instances

        return shard_instances(self.mesh, np.asarray(arr))

    def _build_arena(self, false_label0, true_label0, input_label0s):
        """Assemble the label arena ON DEVICE: a zeros buffer + the constant
        rows + ~n_inputs rows of real data, instead of shipping
        arena_size x 16B of host zeros (1.3GB at B=32) through the tunnel
        (whose large-transfer path runs at ~0.2 MB/s — see h2d)."""
        plan = self.plan
        batched = self.batch
        shape = (batched, self.arena_size, 4) if batched else (self.arena_size, 4)
        if self.mesh is not None:
            arena = np.zeros(shape, dtype=np.uint32)
            arena[..., 0, :] = false_label0
            arena[..., 1, :] = true_label0
            arena[..., plan.input_abs, :] = input_label0s
            return self._shard(arena)
        consts = np.stack(
            [np.asarray(false_label0, np.uint32),
             np.asarray(true_label0, np.uint32)], axis=-2)
        arena = jnp.zeros(shape, jnp.uint32)
        arena = arena.at[..., 0:2, :].set(jnp.asarray(consts))
        return arena.at[..., jnp.asarray(plan.input_abs), :].set(
            h2d(np.asarray(input_label0s, np.uint32)))

    def _build_bits(self, input_bits):
        """Evaluator bit vector, assembled on device (see _build_arena)."""
        plan = self.plan
        batched = self.batch
        bshape = (batched, self.arena_size) if batched else (self.arena_size,)
        if self.mesh is not None:
            bits = np.zeros(bshape, dtype=np.uint8)
            bits[..., 1] = 1
            bits[..., plan.input_abs] = input_bits
            return self._shard(bits)
        bits = jnp.zeros(bshape, jnp.uint8).at[..., 1].set(1)
        return bits.at[..., jnp.asarray(plan.input_abs)].set(
            h2d(np.asarray(input_bits, np.uint8)))

    # -- device-resident per-tape / per-group data -----------------------

    def _seg_dev(self, tape):
        key = ("gsegs", tape.content_key)
        dev = self._dev.get(key)
        if dev is None:
            segs_np, oo_np, meta = padded_seg_args_group(tape)
            segs = [{f: h2d(v) for f, v in d.items()} for d in segs_np]
            dev = (segs, jnp.asarray(oo_np), meta)
            self._dev[key] = dev
        return dev

    def _seg_dev_packed(self, tape):
        """(pool32, pool8, layout, oo, meta) for the packed dispatch path."""
        key = ("gsegsP", tape.content_key)
        dev = self._dev.get(key)
        if dev is None:
            segs_np, oo_np, meta = padded_seg_args_group(tape)
            pool32, pool8, layout = pack_seg_args(segs_np)
            dev = (h2d(pool32), h2d(pool8), layout,
                   jnp.asarray(oo_np), meta)
            self._dev[key] = dev
        return dev

    def _dispatch(self, mode: str, commit: bool, emit_cts: bool, tape, S: int):
        """(fn, oo, meta, tail) for one group dispatch — plain or packed.
        ``tail`` is appended to the program args (segs pytree, or the two
        packed pools).  Fat-tape siteloop programs (S>1 with huge per-site
        ciphertext blocks) stay on the plain path: their packed form crashes
        the remote TPU compiler (HTTP 500, tpu_compile_helper exit 1), and
        they are ~37 dispatches carrying <1% of the plan's gates."""
        if self.packed and use_packed_segs(tape, S):
            p32, p8, layout, oo, meta = self._seg_dev_packed(tape)
            fn = _packed_group_jit(mode, self.hasher, self.batch, commit,
                                   emit_cts, layout)
            return fn, oo, meta, (p32, p8)
        segs, oo, meta = self._seg_dev(tape)
        fn = _generic_group_jit(mode, self.hasher, self.batch, commit,
                                emit_cts)
        return fn, oo, meta, (segs,)

    @staticmethod
    def _group_maps_np(g, meta):
        """Host-side per-group constant arrays (bucket-padded header and
        output maps, frame/gate-id bases, per-site ciphertext row bases)."""
        Hb, ob, ctb = meta["Hb"], meta["ob"], meta["ctb"]
        S = g.header_maps.shape[0]
        hm = np.full((S, Hb), _TRASH, dtype=np.int32)
        hm[:, : g.header_maps.shape[1]] = g.header_maps
        om = np.full((S, max(ob, 1)), _TRASH, dtype=np.int32)
        if g.outputs_maps.shape[1]:
            om[:, : g.outputs_maps.shape[1]] = g.outputs_maps
        trash_row = S * ctb
        ct_loc = np.where(
            np.arange(S) < g.n_real,
            np.arange(S, dtype=np.int64) * ctb,
            trash_row,
        ).astype(np.int32)
        return (
            hm,
            om,
            g.frame_bases.astype(np.int32),
            (g.gid_bases >> 32).astype(np.uint32),
            (g.gid_bases & 0xFFFFFFFF).astype(np.uint32),
            ct_loc,
            trash_row,
        )

    def _token(self, trash_row: int):
        """Zero-width ciphertext-shape token, shared across groups with the
        same trash row (read-only — the group programs never donate it)."""
        key = ("token", trash_row)
        t = self._dev.get(key)
        if t is None:
            t = jnp.zeros((trash_row + 1, 0), jnp.uint32)
            self._dev[key] = t
        return t

    def _group_dev(self, g, gidx: int):
        key = ("gmaps", id(g))
        dev = self._dev.get(key)
        if dev is None:
            if self.packed:
                meta = self._seg_dev_packed(g.tape)[4]
            else:
                _, _, meta = self._seg_dev(g.tape)
            hm, om, fb, ghi, glo, ct_loc, trash_row = self._group_maps_np(g, meta)
            dev = (
                h2d(hm),  # fat-tape header maps reach >100MB — must chunk
                h2d(om),
                jnp.asarray(fb),
                jnp.asarray(ghi),
                jnp.asarray(glo),
                jnp.asarray(ct_loc),
                self._token(trash_row),
                jnp.uint32(gidx),
            )
            self._dev[key] = dev
        return dev

    def preload_constants(self, threads: int | None = None) -> float:
        """Upload every per-pass device constant up front, concurrently.

        The tunneled PJRT client serializes individual ``device_put``s at
        ~0.7s apiece but pipelines concurrent ones at ~1ms each
        (scripts/probe_transfers.py, r4), and a full-verifier pass touches
        ~250k constant arrays / ~1GB (scripts/upload_census.py) — lazily
        uploaded from the dispatch loop they cost the first pass ~37min of
        enqueue stalls; through a small thread pool here they take ~1-5min.
        Safe to call repeatedly: resident entries are skipped.  Returns the
        wall seconds spent."""
        import time
        from concurrent.futures import ThreadPoolExecutor

        from gsv_tpu.circuit.schedule import GroupStep

        threads = threads or int(os.environ.get("GSV_PRELOAD_THREADS", "4"))
        t0 = time.perf_counter()
        host_segs: dict = {}

        def seg_host(tape):
            ck = tape.content_key
            if ck not in host_segs:
                host_segs[ck] = padded_seg_args_group(tape)
            return host_segs[ck]

        futs: dict = {}
        with ThreadPoolExecutor(threads) as pool:
            for gi, g in enumerate(self.plan.steps):
                if not isinstance(g, GroupStep):
                    key = ("gcopy", id(g))
                    if key not in self._dev and key not in futs:
                        futs[key] = ("copy", pool.submit(h2d, g.src),
                                     pool.submit(h2d, g.dst))
                    continue
                S = g.header_maps.shape[0]
                segs_np, oo_np, meta = seg_host(g.tape)
                if self.packed and use_packed_segs(g.tape, S):
                    skey = ("gsegsP", g.tape.content_key)
                    if skey not in self._dev and skey not in futs:
                        p32, p8, layout = pack_seg_args(segs_np)
                        futs[skey] = ("segsP", pool.submit(h2d, p32),
                                      pool.submit(h2d, p8), layout,
                                      pool.submit(jnp.asarray, oo_np), meta)
                else:
                    skey = ("gsegs", g.tape.content_key)
                    if skey not in self._dev and skey not in futs:
                        fsegs = [{f: pool.submit(h2d, v) for f, v in d.items()}
                                 for d in segs_np]
                        futs[skey] = ("segs", fsegs,
                                      pool.submit(jnp.asarray, oo_np), meta)
                gkey = ("gmaps", id(g))
                if gkey not in self._dev and gkey not in futs:
                    hm, om, fb, ghi, glo, ct_loc, tr = self._group_maps_np(g, meta)
                    tkey = ("token", tr)
                    if tkey not in self._dev and tkey not in futs:
                        futs[tkey] = ("token",
                                      pool.submit(jnp.zeros, (tr + 1, 0),
                                                  jnp.uint32))
                    futs[gkey] = (
                        "gmaps",
                        [pool.submit(h2d, a)
                         for a in (hm, om, fb, ghi, glo, ct_loc)],
                        tr,
                        pool.submit(jnp.uint32, gi),
                    )
            # tokens first (gmaps assembly reads them through self._dev)
            for key, spec in futs.items():
                if spec[0] == "token":
                    self._dev[key] = spec[1].result()
            for key, spec in futs.items():
                kind = spec[0]
                if kind == "token":
                    continue
                if kind == "segs":
                    segs = [{f: fu.result() for f, fu in d.items()}
                            for d in spec[1]]
                    self._dev[key] = (segs, spec[2].result(), spec[3])
                elif kind == "segsP":
                    self._dev[key] = (spec[1].result(), spec[2].result(),
                                      spec[3], spec[4].result(), spec[5])
                elif kind == "gmaps":
                    arrs = [fu.result() for fu in spec[1]]
                    self._dev[key] = (*arrs, self._dev[("token", spec[2])],
                                      spec[3].result())
                else:
                    self._dev[key] = (spec[1].result(), spec[2].result())
        return time.perf_counter() - t0

    def preload_programs(self, modes=("garble_nocts",), commit: bool = True,
                         threads: int | None = None, only=None) -> float:
        """Warm-execute every distinct group program for ``modes`` up front.

        The dispatch loop's first call per program otherwise triggers the
        persistent-cache executable deserialize+load round trip through the
        tunnel (3-60 s apiece, ~86 programs) interleaved into the timed
        pass (the r4 bench crawled at 150M plan-gates/397 s before this).
        An AOT ``.lower().compile()`` would NOT help: its executable lives
        on the Compiled object, not in the jit dispatch cache — so this
        dispatches each program once on throwaway device buffers (donation
        threads one arena through, keeping HBM flat).  Requires
        ``preload_constants`` first (reuses its device-resident maps).
        Modes: "garble_nocts" (cts-free committed garble), "garble",
        "evaluate", "execute".  A small thread pool overlaps the per-program
        compile/load RPCs (each thread owns its donated buffers); a cold
        warmup — e.g. after a jax version bump invalidates the persistent
        cache — is ~86 remote recompiles, so expect 15-60 min the first
        time and minutes on a warm cache.  Returns wall seconds."""
        import time
        from concurrent.futures import ThreadPoolExecutor

        from gsv_tpu.circuit.schedule import GroupStep

        # 2 threads, not preload_constants' 4: each thread owns a full
        # donated arena (~1.2GB at B=32) plus its in-flight programs'
        # workspaces — 4 warm-execution threads OOM'd a 16GB chip (r4)
        threads = threads or int(os.environ.get("GSV_WARM_THREADS", "2"))
        t0 = time.perf_counter()
        progs = {}
        for gi, g in enumerate(self.plan.steps):
            if isinstance(g, GroupStep):
                # one warm execution per compiled program = per (shape
                # signature, S-bucket); content_key is finer (~5x more
                # units) and adds nothing — executables key on shapes
                k = (tape_signature(g.tape), g.header_maps.shape[0])
                # `only`: restrict to these (signature, S) keys — the mega
                # path needs just its residual (excluded) programs warm
                if only is not None and k not in only:
                    continue
                progs.setdefault(k, (gi, g))
        B = self.batch
        A = self.arena_size
        work = list(progs.values())
        done = [0]

        def warm_shard(shard):
            arena = jnp.zeros((B, A, 4) if B else (A, 4), jnp.uint32)
            delta = jnp.zeros((B, 4) if B else (4,), jnp.uint32)
            digest = jnp.zeros((B, 4) if B else (4,), jnp.uint32)
            bits = jnp.zeros((B, A) if B else (A,), jnp.uint8)
            for mode in modes:
                emit_cts = mode != "garble_nocts"
                m = "garble" if mode == "garble_nocts" else mode
                for gi, g in shard:
                    # execute-mode dispatches are keyed (commit=False,
                    # emit_cts=True) — mirror the run loop exactly
                    fn, oo, meta, tail = self._dispatch(
                        m, False if m == "execute" else commit,
                        True if m == "execute" else emit_cts,
                        g.tape, g.header_maps.shape[0])
                    hm, om, fb, ghi, glo, ct_loc, token, gid = (
                        self._group_dev(g, gi))
                    if m == "garble":
                        out = fn(arena, token, hm, om, oo, fb, delta, ghi,
                                 glo, ct_loc, digest, gid, *tail)
                        if emit_cts:
                            arena, _, digest = out
                        else:
                            arena, digest = out
                    elif m == "evaluate":
                        cts_in = jnp.zeros(
                            (B, token.shape[0], 4) if B
                            else (token.shape[0], 4),
                            jnp.uint32,
                        )
                        arena, bits, digest = fn(
                            arena, bits, cts_in, hm, om, oo, fb, ghi, glo,
                            ct_loc, digest, gid, *tail,
                        )
                    else:  # execute
                        bits = fn(bits, hm, om, oo, fb, *tail)
                    done[0] += 1
                    if done[0] % 8 == 0:
                        # drain the async queue: each pending execution
                        # holds its device workspace, and an unbounded
                        # queue OOMs the chip (r4 run: RESOURCE_EXHAUSTED
                        # ~330 queued warm executions in)
                        np.asarray(digest if m != "execute"
                                   else bits[..., :1])
                        print(f"[preload] {done[0]} program warm-executions "
                              f"({time.perf_counter()-t0:.0f}s)", flush=True)
                # honest barrier: loads are done once results are readable
                np.asarray(digest if m != "execute" else bits[..., :1])

        if threads <= 1 or len(work) <= 1:
            warm_shard(work)
        else:
            with ThreadPoolExecutor(threads) as pool:
                futs = [pool.submit(warm_shard, work[k::threads])
                        for k in range(threads)]
                for f in futs:
                    f.result()
        return time.perf_counter() - t0

    def _progress(self, phase: str):
        from gsv_tpu.core.progress import ProgressLogger

        return ProgressLogger(phase)

    class _InflightGate:
        """Bounds the async dispatch queue by estimated ciphertext-buffer
        bytes.  The Python loop enqueues groups far faster than the device
        retires them; every pending garble holds its (up to ~1GB at B=32)
        cts output in HBM, so an unbounded queue OOMs the chip ~half-way
        through a full-verifier pass.  Blocking on the oldest queued handle
        keeps ~budget bytes in flight without draining the pipeline."""

        def __init__(self, budget=None):
            from collections import deque

            self.budget = budget or int(
                os.environ.get("GSV_INFLIGHT_BYTES", 2 << 30)
            )
            self.q = deque()
            self.bytes = 0

        def add(self, handle, nbytes: int):
            self.q.append((handle, nbytes))
            self.bytes += nbytes
            while self.bytes > self.budget and len(self.q) > 1:
                h, b = self.q.popleft()
                jax.block_until_ready(h)
                self.bytes -= b

    def _copy_dev(self, g):
        """Device-resident src/dst index arrays for a CopyStep (uploading
        through the tunnel once, not once per pass)."""
        key = ("gcopy", id(g))
        dev = self._dev.get(key)
        if dev is None:
            dev = (h2d(g.src), h2d(g.dst))
            self._dev[key] = dev
        return dev

    def _copy_fn(self, mode: str):
        key = ("copy", mode)
        fn = self._dev.get(key)
        if fn is None:
            if mode == "evaluate":

                def cp(arena, bits, src, dst):
                    return arena.at[dst].set(arena[src]), bits.at[dst].set(bits[src])

                if self.batch:
                    cp = jax.vmap(cp, in_axes=(0, 0, None, None))
                fn = jax.jit(cp, donate_argnums=(0, 1))
            else:

                def cp(arena, src, dst):
                    return arena.at[dst].set(arena[src])

                if self.batch:
                    cp = jax.vmap(cp, in_axes=(0, None, None))
                fn = jax.jit(cp, donate_argnums=(0,))
            self._dev[key] = fn
        return fn

    # -- drivers ---------------------------------------------------------

    def execute(self, input_bits: np.ndarray):
        from gsv_tpu.circuit.schedule import GroupStep

        plan = self.plan
        batched = self.batch
        arena = self._build_bits(input_bits)
        prog = self._progress("executed")
        for gi, g in enumerate(plan.steps):
            if isinstance(g, GroupStep):
                fn, oo, _, tail = self._dispatch("execute", False, True, g.tape, g.header_maps.shape[0])
                hm, om, fb, _, _, _, _, _ = self._group_dev(g, gi)
                arena = fn(arena, hm, om, oo, fb, *tail)
                prog.advance(g.tape.total_gates * g.n_real)
            else:
                src, dst = self._copy_dev(g)
                arena = self._copy_fn("execute")(arena, src, dst)
        arena = np.asarray(arena)
        return arena[..., plan.output_abs]

    def garble(self, input_label0s, delta, false_label0, true_label0,
               ct_handler=None, commit: bool = False,
               checkpoint_gates: int = 0, checkpoint_fn=None):
        """Returns (output_label0s, arena, digest) — digest is None unless
        ``commit``; ``ct_handler(group, cts, meta)`` receives each group's
        device ciphertext buffer (see GroupStep layout).

        ``checkpoint_gates`` > 0 (requires ``commit``): every that many
        per-instance gates, force an honest D2H digest fetch and call
        ``checkpoint_fn(gates_done)`` — lets a benchmark emit verified
        partial throughput even if the process is killed mid-pass."""
        from gsv_tpu.circuit.schedule import GroupStep

        plan = self.plan
        batched = self.batch
        arena = self._build_arena(false_label0, true_label0, input_label0s)
        delta = self._shard(np.asarray(delta, dtype=np.uint32))
        digest = self._shard(np.zeros((batched, 4) if batched else (4,), np.uint32))
        # Handler-less committed garbling uses the cts-free program variant:
        # queued dispatches then hold no ciphertext buffers, so the pipeline
        # can run deep without OOM or throttling.
        nocts = ct_handler is None and commit
        prog = self._progress("garbled")
        gate = self._InflightGate()
        nb = batched or 1
        # The cts-free path holds no big output buffers, but each QUEUED
        # remote execution still pins device workspace — an unthrottled
        # enqueue (constants+programs preloaded, 21s for 7k dispatches)
        # wedged the chip for >30 min (r4).  Bound queue DEPTH with a
        # cheap digest sync every N dispatches (~27 ms RTT apiece).
        max_q = int(os.environ.get("GSV_MAX_QUEUE", "256"))
        since_sync = 0
        memlog = int(os.environ.get("GSV_MEM_LOG", 0))
        gates_done = 0
        next_ckpt = checkpoint_gates if (checkpoint_gates and commit) else None
        for gi, g in enumerate(plan.steps):
            if memlog and gi % memlog == 0:
                try:
                    st = jax.devices()[0].memory_stats()
                    print(
                        f"[mem] step {gi}/{len(plan.steps)} "
                        f"in_use={st.get('bytes_in_use', -1)/1e9:.2f}GB "
                        f"peak={st.get('peak_bytes_in_use', -1)/1e9:.2f}GB "
                        f"inflight={gate.bytes/1e9:.2f}GB",
                        flush=True,
                    )
                except Exception:
                    memlog = 0
            if isinstance(g, GroupStep):
                fn, oo, meta, tail = self._dispatch(
                    "garble", commit, not nocts, g.tape, g.header_maps.shape[0])
                hm, om, fb, ghi, glo, ct_loc, token, gid = self._group_dev(g, gi)
                if nocts:
                    arena, digest = fn(
                        arena, token, hm, om, oo, fb, delta, ghi, glo, ct_loc,
                        digest, gid, *tail,
                    )
                    since_sync += 1
                    if since_sync >= max_q:
                        np.asarray(digest)  # drain the execution queue
                        since_sync = 0
                else:
                    arena, cts, digest = fn(
                        arena, token, hm, om, oo, fb, delta, ghi, glo, ct_loc,
                        digest, gid, *tail,
                    )
                    if ct_handler is not None and g.tape.ct_count:
                        ct_handler(g, cts, meta)
                    gate.add(cts, token.shape[0] * 16 * nb)
                prog.advance(g.tape.total_gates * g.n_real)
                gates_done += g.tape.total_gates * g.n_real
                if next_ckpt is not None and gates_done >= next_ckpt:
                    np.asarray(digest)  # honest sync: D2H value fetch
                    if checkpoint_fn is not None:
                        checkpoint_fn(gates_done)
                    next_ckpt += checkpoint_gates
            else:
                src, dst = self._copy_dev(g)
                arena = self._copy_fn("execute")(arena, src, dst)
        out = np.asarray(arena[..., plan.output_abs, :])
        return out, arena, (np.asarray(digest) if commit else None)

    def evaluate(self, input_labels, input_bits, false_active, true_active,
                 ct_source, commit: bool = False):
        """``ct_source(group, meta)`` must return that group's ciphertext
        buffer ((S*ctb+1, 4) or batched) in the GroupStep layout.  With
        ``commit`` the same digest fold as garble runs over the consumed
        buffers; returns (labels, bits, digest|None)."""
        from gsv_tpu.circuit.schedule import GroupStep

        plan = self.plan
        batched = self.batch
        arena = self._build_arena(false_active, true_active, input_labels)
        bits = self._build_bits(input_bits)
        digest = self._shard(np.zeros((batched, 4) if batched else (4,), np.uint32))
        prog = self._progress("evaluated")
        gate = self._InflightGate()
        nb = batched or 1
        for gi, g in enumerate(plan.steps):
            if isinstance(g, GroupStep):
                fn, oo, meta, tail = self._dispatch(
                    "evaluate", commit, True, g.tape, g.header_maps.shape[0])
                hm, om, fb, ghi, glo, ct_loc, _, gid = self._group_dev(g, gi)
                cts_in = jnp.asarray(ct_source(g, meta))
                arena, bits, digest = fn(
                    arena, bits, cts_in, hm, om, oo, fb,
                    ghi, glo, ct_loc, digest, gid, *tail,
                )
                gate.add(cts_in, cts_in.shape[-2] * 16 * nb)
                prog.advance(g.tape.total_gates * g.n_real)
            else:
                src, dst = self._copy_dev(g)
                arena, bits = self._copy_fn("evaluate")(arena, bits, src, dst)
        return (
            np.asarray(arena[..., plan.output_abs, :]),
            np.asarray(bits[..., plan.output_abs]),
            (np.asarray(digest) if commit else None),
        )

    def garble_evaluate_2pc(self, input_label0s, input_bits, delta,
                            false_label0, true_label0, eval_active=None,
                            eval_false_active=None, eval_true_active=None):
        """Full 2PC roundtrip in one group-locked pass (the reference's
        groth16_garble.rs garbler->evaluator flow, reference
        examples/groth16_garble.rs:88-268): the garbler and evaluator arenas
        advance together and each group's ciphertext buffer is consumed
        on-device the moment it is produced — the 172GB stream never exists
        at once and never leaves HBM.  By default input selection
        (label0 ^ bit*delta) stands in for the OT the reference driver also
        elides; a protocol caller passes the evaluator's received
        ``eval_active`` labels (+ constant-wire actives) explicitly.

        Returns a dict with the garbler's output label0s and stream digest,
        and the evaluator's active output labels, plaintext values, and
        consumed-stream digest (protocol check: digests must match, and
        active label == label0 ^ value*delta)."""
        from gsv_tpu.circuit.schedule import GroupStep

        plan = self.plan
        batched = self.batch

        l0 = np.asarray(input_label0s, np.uint32)
        ib = np.asarray(input_bits, np.uint8)
        d = np.asarray(delta, np.uint32)
        if eval_active is None:
            eval_active = l0 ^ (ib[..., None].astype(np.uint32) * d[..., None, :])
        if eval_false_active is None:
            eval_false_active = np.asarray(false_label0, np.uint32)
        if eval_true_active is None:
            eval_true_active = np.asarray(true_label0, np.uint32) ^ d

        arena_g = self._build_arena(false_label0, true_label0, l0)
        arena_e = self._build_arena(eval_false_active, eval_true_active,
                                    np.asarray(eval_active, np.uint32))
        bits_e = self._build_bits(ib)
        delta_dev = self._shard(d)
        dig_g = self._shard(np.zeros((batched, 4) if batched else (4,), np.uint32))
        dig_e = self._shard(np.zeros((batched, 4) if batched else (4,), np.uint32))
        jg = _generic_group_jit("garble", self.hasher, batched, True)
        je = _generic_group_jit("evaluate", self.hasher, batched, True)
        cp_g = self._copy_fn("execute")
        cp_e = self._copy_fn("evaluate")
        prog = self._progress("2pc")
        gate = self._InflightGate()
        nb = batched or 1
        for gi, g in enumerate(plan.steps):
            if isinstance(g, GroupStep):
                segs, oo, meta = self._seg_dev(g.tape)
                hm, om, fb, ghi, glo, ct_loc, token, gid = self._group_dev(g, gi)
                arena_g, cts, dig_g = jg(
                    arena_g, token, hm, om, oo, fb, delta_dev, ghi, glo,
                    ct_loc, dig_g, gid, segs,
                )
                arena_e, bits_e, dig_e = je(
                    arena_e, bits_e, cts, hm, om, oo, fb, ghi, glo,
                    ct_loc, dig_e, gid, segs,
                )
                gate.add(cts, token.shape[0] * 16 * nb)
                prog.advance(g.tape.total_gates * g.n_real)
            else:
                src, dst = self._copy_dev(g)
                arena_g = cp_g(arena_g, src, dst)
                arena_e, bits_e = cp_e(arena_e, bits_e, src, dst)
        return {
            "out_label0": np.asarray(arena_g[..., plan.output_abs, :]),
            "garble_digest": np.asarray(dig_g),
            "out_active": np.asarray(arena_e[..., plan.output_abs, :]),
            "out_bits": np.asarray(bits_e[..., plan.output_abs]),
            "evaluate_digest": np.asarray(dig_e),
        }


# ----------------------------------------------------------------------
# Executors
# ----------------------------------------------------------------------


class PlanExecutor:
    """Runs a linked Plan in one of the three modes.

    Per-tape wrappers are cached per (tape content, mode, hasher); the
    underlying jitted programs are shared per shape signature (see module
    docstring).  Progress is logged every 50M gates
    (``gsv_tpu.core.progress``) for the monitor scripts.
    """

    def __init__(
        self,
        plan: Plan,
        batch: int | None = None,
        instance: int | None = None,
        hasher: str = "aes",
    ):
        assert hasher in ("aes", "aes_pallas", "aes_pallas2", "blake3")
        self.plan = plan
        self.batch = batch  # None = unbatched
        self.instance = instance
        self.hasher = hasher
        self._fns: dict = {}

    def _progress(self, phase: str):
        from gsv_tpu.core.progress import ProgressLogger

        return ProgressLogger(phase, instance=self.instance)

    # -- per-tape wrappers ---------------------------------------------

    def _seg_dev(self, tape: CompiledTape) -> tuple:
        """Device-resident bucket-padded segment arrays + out_ops + meta,
        uploaded once per distinct tape."""
        key = ("segs", tape.content_key)
        dev = self._fns.get(key)
        if dev is None:
            segs_np, oo_np, meta = padded_seg_args(tape)
            segs = [{f: h2d(v) for f, v in d.items()} for d in segs_np]
            token = jnp.zeros((max(meta["ctb"], 0) + 1, 0), jnp.uint32)
            dev = (segs, jnp.asarray(oo_np), token, meta)
            self._fns[key] = dev
        return dev

    def _step_maps(self, st: TapeStep):
        """Bucket-padded, device-resident header/outputs maps and gid-base
        scalars per plan step (uploading these per call costs a tunnel
        round trip each)."""
        key = ("maps", id(st))
        dev = self._fns.get(key)
        if dev is None:
            _, _, _, meta = self._seg_dev(st.tape)
            dev = (
                _pad_map(jnp.asarray(st.header_map), meta["Hb"]),
                _pad_map(jnp.asarray(st.outputs_map), meta["ob"]),
                jnp.uint32(st.gid_base >> 32),
                jnp.uint32(st.gid_base & 0xFFFFFFFF),
            )
            self._fns[key] = dev
        return dev

    def _fn(self, tape: CompiledTape, mode: str):
        key = (tape.content_key, mode, self.hasher)
        fn = self._fns.get(key)
        if fn is not None:
            return fn
        segs_dev, out_ops_dev, ct_token, meta = self._seg_dev(tape)
        jfn = _generic_jit(mode, self.hasher, self.batch)
        Hb, ctb, ct, ob = meta["Hb"], meta["ctb"], meta["ct"], meta["ob"]

        if mode == "execute":

            def call(arena, header_map, outputs_map, frame_base,
                     _j=jfn, _s=segs_dev, _o=out_ops_dev):
                return _j(
                    arena, _pad_map(header_map, Hb), _pad_map(outputs_map, ob),
                    _o, frame_base, _s,
                )

        elif mode == "garble":

            def call(arena, header_map, outputs_map, frame_base, delta, gid_hi,
                     gid_lo, _j=jfn, _s=segs_dev, _o=out_ops_dev, _t=ct_token):
                arena, cts = _j(
                    arena, _t, _pad_map(header_map, Hb),
                    _pad_map(outputs_map, ob), _o, frame_base,
                    delta, gid_hi, gid_lo, _s,
                )
                return arena, cts[..., :ct, :]

        elif mode == "evaluate":

            def call(arena, bits, cts_in, header_map, outputs_map, frame_base,
                     gid_hi, gid_lo, _j=jfn, _s=segs_dev, _o=out_ops_dev):
                pad = max(ctb, 1) - cts_in.shape[-2]
                if pad:
                    width = [(0, 0)] * (cts_in.ndim - 2) + [(0, pad), (0, 0)]
                    cts_in = jnp.pad(jnp.asarray(cts_in), width)
                return _j(
                    arena, bits, cts_in, _pad_map(header_map, Hb),
                    _pad_map(outputs_map, ob), _o,
                    frame_base, gid_hi, gid_lo, _s,
                )

        else:
            raise ValueError(mode)

        self._fns[key] = call
        return call

    def _copy_fn(self, n: int, mode: str):
        key = ("copy", n, mode)
        fn = self._fns.get(key)
        if fn is None:
            if mode == "evaluate":

                def cp(arena, bits, src, dst):
                    return arena.at[dst].set(arena[src]), bits.at[dst].set(bits[src])

                if self.batch:
                    cp = jax.vmap(cp, in_axes=(0, 0, None, None))
                fn = jax.jit(cp, donate_argnums=(0, 1))
            else:

                def cp(arena, src, dst):
                    return arena.at[dst].set(arena[src])

                if self.batch:
                    cp = jax.vmap(cp, in_axes=(0, None, None))
                fn = jax.jit(cp, donate_argnums=(0,))
            self._fns[key] = fn
        return fn

    # -- drivers -------------------------------------------------------

    def execute(self, input_bits: np.ndarray):
        """input_bits: (n_inputs,) or (B, n_inputs) 0/1.  Returns output bits."""
        plan = self.plan
        batched = self.batch
        shape = (batched, plan.arena_size) if batched else (plan.arena_size,)
        arena = np.zeros(shape, dtype=np.uint8)
        arena[..., 1] = 1
        arena[..., plan.input_abs] = input_bits
        arena = jnp.asarray(arena)
        prog = self._progress("executed")
        for st in plan.steps:
            if isinstance(st, TapeStep):
                fn = self._fn(st.tape, "execute")
                hm, om, _, _ = self._step_maps(st)
                arena = fn(arena, hm, om, st.frame_base)
                prog.advance(st.tape.total_gates)
            else:
                arena = self._copy_fn(len(st.src), "execute")(
                    arena, jnp.asarray(st.src), jnp.asarray(st.dst)
                )
        arena = np.asarray(arena)
        return arena[..., plan.output_abs]

    def garble(self, input_label0s, delta, false_label0, true_label0, ct_handler=None, mesh=None):
        """Garble one (or a batch of) instances.

        ``input_label0s``: (n_inputs, 4) or (B, n_inputs, 4) uint32 words;
        ``delta``: (4,) or (B, 4).  ``ct_handler(step_cts)`` receives each
        step's ciphertext block (ct_count_step, 4) (or with leading batch
        axis) in stream order.  Returns (output_label0s, arena).

        ``mesh``: optional ``jax.sharding.Mesh`` with an ``instances`` axis —
        the batch axis is sharded across it and every step runs SPMD (the
        multi-chip cut-and-choose layout; instances are data, the plan is
        the replicated program).
        """
        plan = self.plan
        batched = self.batch
        shape = (batched, plan.arena_size, 4) if batched else (plan.arena_size, 4)
        arena = np.zeros(shape, dtype=np.uint32)
        arena[..., 0, :] = false_label0
        arena[..., 1, :] = true_label0
        arena[..., plan.input_abs, :] = input_label0s
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            assert batched, "mesh sharding requires a batched executor"
            n_dev = mesh.devices.size
            if batched % n_dev:
                raise ValueError(
                    f"instance batch ({batched}) must be a multiple of the "
                    f"mesh's device count ({n_dev}) to shard evenly - pad "
                    f"the seed list or shrink the mesh"
                )
            sh = NamedSharding(mesh, P("instances", None, None))
            arena = jax.device_put(arena, sh)
            delta = jax.device_put(
                np.asarray(delta, dtype=np.uint32), NamedSharding(mesh, P("instances", None))
            )
        else:
            arena = jnp.asarray(arena)
        delta = jnp.asarray(delta, dtype=jnp.uint32)
        prog = self._progress("garbled")
        for st in plan.steps:
            if isinstance(st, TapeStep):
                fn = self._fn(st.tape, "garble")
                hm, om, gid_hi, gid_lo = self._step_maps(st)
                arena, cts = fn(
                    arena, hm, om, st.frame_base, delta, gid_hi, gid_lo
                )
                if ct_handler is not None and st.tape.ct_count:
                    ct_handler(cts)
                prog.advance(st.tape.total_gates)
            else:
                arena = self._copy_fn(len(st.src), "execute")(
                    arena, jnp.asarray(st.src), jnp.asarray(st.dst)
                )
        out = np.asarray(arena[..., plan.output_abs, :])
        return out, arena

    def evaluate(self, input_labels, input_bits, false_active, true_active, ct_source):
        """Evaluate from a ciphertext stream.

        ``ct_source(ct_base, count)`` must return that slice of the stream as
        (count, 4) (or batched) uint32 words.  Returns (labels, bits) of the
        outputs.
        """
        plan = self.plan
        batched = self.batch
        lshape = (batched, plan.arena_size, 4) if batched else (plan.arena_size, 4)
        bshape = (batched, plan.arena_size) if batched else (plan.arena_size,)
        arena = np.zeros(lshape, dtype=np.uint32)
        bits = np.zeros(bshape, dtype=np.uint8)
        arena[..., 0, :] = false_active
        arena[..., 1, :] = true_active
        bits[..., 1] = 1
        arena[..., plan.input_abs, :] = input_labels
        bits[..., plan.input_abs] = input_bits
        arena = jnp.asarray(arena)
        bits = jnp.asarray(bits)
        prog = self._progress("evaluated")
        for st in plan.steps:
            if isinstance(st, TapeStep):
                fn = self._fn(st.tape, "evaluate")
                if st.tape.ct_count == 0:
                    cts_in = np.zeros(
                        (self.batch, 1, 4) if batched else (1, 4), dtype=np.uint32
                    )
                else:
                    cts_in = ct_source(st.ct_base, st.tape.ct_count)
                hm, om, gid_hi, gid_lo = self._step_maps(st)
                arena, bits = fn(
                    arena, bits, jnp.asarray(cts_in), hm, om,
                    st.frame_base, gid_hi, gid_lo,
                )
                prog.advance(st.tape.total_gates)
            else:
                arena, bits = self._copy_fn(len(st.src), "evaluate")(
                    arena, bits, jnp.asarray(st.src), jnp.asarray(st.dst)
                )
        return (
            np.asarray(arena[..., plan.output_abs, :]),
            np.asarray(bits[..., plan.output_abs]),
        )
