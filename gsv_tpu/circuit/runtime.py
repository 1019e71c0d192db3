"""Vectorized plan execution on JAX (CPU or TPU): Execute / Garble / Evaluate.

Each ``CompiledTape`` becomes one jitted function that replays its wave
schedule as dense label algebra against the global slot arena:

- free gates: one gather + XOR + scatter over ``(w, 4)`` uint32 labels
  (Free-XOR, ``halfgates_garbling.rs:14-16``)
- AND-variants: batched fixed-key bitsliced AES over ``2w`` blocks
  (garble: hash both a-labels; evaluate: hash the single active a-label),
  alpha-parameter selects as constant masks, ciphertexts scattered into the
  stream slot given by their program-order rank
  (``halfgates_garbling.rs:17-69``)

The arena is donated between steps so XLA updates it in place.  An optional
leading batch axis vectorizes whole cut-and-choose instances (same plan,
different seeds) — the TPU analogue of the reference's rayon instance pool
(``cut_and_choose/mod.rs:131-186``).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from gsv_tpu.circuit.link import CopyStep, Plan, TapeStep
from gsv_tpu.circuit.tape import CompiledTape
from gsv_tpu.ops.aes_jax import aes_encrypt_words
from gsv_tpu.ops.tweaks import tweak_words


def _mask32(bits_u8: np.ndarray) -> np.ndarray:
    """0/1 uint8 per gate -> (w, 1) uint32 0/0xFFFFFFFF mask constant."""
    return (np.asarray(bits_u8, dtype=np.uint32) * np.uint32(0xFFFFFFFF))[:, None]


def _abs_idx(op_codes: np.ndarray, header_map, frame_base, H: int):
    ops = jnp.asarray(op_codes)
    hdr = header_map[jnp.clip(ops, 0, H - 1)]
    return jnp.where(ops < H, hdr, frame_base + ops - H)


def _pad32(blocks):
    n = blocks.shape[0]
    pad = (-n) % 32
    if pad:
        blocks = jnp.concatenate([blocks, jnp.zeros((pad, 4), jnp.uint32)], axis=0)
    return blocks, n


def _local_gid64(gid_base_hi, gid_base_lo, local: np.ndarray):
    lo = gid_base_lo + jnp.asarray(local, dtype=jnp.uint32)
    carry = (lo < gid_base_lo).astype(jnp.uint32)
    hi = gid_base_hi + carry
    return hi, lo


# ----------------------------------------------------------------------
# Per-tape step functions (single instance; batching via jax.vmap)
# ----------------------------------------------------------------------


def _execute_tape(tape: CompiledTape, arena, header_map, frame_base):
    """Boolean execution: arena is (A,) uint8."""
    H = tape.header_size
    for wv in tape.waves:
        if len(wv.f_a):
            a = arena[_abs_idx(wv.f_a, header_map, frame_base, H)]
            b = arena[_abs_idx(wv.f_b, header_map, frame_base, H)]
            out = a ^ (b & jnp.asarray(wv.f_bmask)) ^ jnp.asarray(wv.f_flip)
            arena = arena.at[frame_base + jnp.asarray(wv.f_c)].set(out)
        if len(wv.n_a):
            a = arena[_abs_idx(wv.n_a, header_map, frame_base, H)]
            b = arena[_abs_idx(wv.n_b, header_map, frame_base, H)]
            tt = jnp.asarray(wv.n_tt)
            out = ((tt >> (a * 2 + b)) & 1).astype(jnp.uint8)
            arena = arena.at[frame_base + jnp.asarray(wv.n_c)].set(out)
    return arena


def _garble_tape(tape: CompiledTape, arena, header_map, frame_base, delta, gid_hi, gid_lo):
    """Half-gates garbling: arena (A, 4) uint32 of label0s; returns cts."""
    H = tape.header_size
    cts = jnp.zeros((max(tape.ct_count, 1), 4), jnp.uint32)
    for wv in tape.waves:
        if len(wv.f_a):
            a = arena[_abs_idx(wv.f_a, header_map, frame_base, H)]
            b = arena[_abs_idx(wv.f_b, header_map, frame_base, H)]
            bm = jnp.asarray(_mask32(wv.f_bmask))
            dm = jnp.asarray(_mask32(wv.f_flip))
            out = a ^ (b & bm) ^ (delta[None, :] & dm)
            arena = arena.at[frame_base + jnp.asarray(wv.f_c)].set(out)
        if len(wv.n_a):
            a0 = arena[_abs_idx(wv.n_a, header_map, frame_base, H)]
            b0 = arena[_abs_idx(wv.n_b, header_map, frame_base, H)]
            aam = jnp.asarray(_mask32(wv.n_aa))
            abm = jnp.asarray(_mask32(wv.n_ab))
            acm = jnp.asarray(_mask32(wv.n_ac))
            d = delta[None, :]
            sel_a = a0 ^ (d & aam)
            other_a = sel_a ^ d
            hi, lo = _local_gid64(gid_hi, gid_lo, wv.n_gid)
            tw = tweak_words(hi, lo, xp=jnp)
            blocks = jnp.concatenate([sel_a ^ tw, other_a ^ tw], axis=0)
            blocks, _ = _pad32(blocks)
            h = aes_encrypt_words(blocks, xp=jnp)
            w = len(wv.n_a)
            h_sel, h_other = h[:w], h[w : 2 * w]
            b_sel = b0 ^ (d & abm)
            ct = h_sel ^ h_other ^ b_sel
            w0 = h_sel ^ (d & acm)
            arena = arena.at[frame_base + jnp.asarray(wv.n_c)].set(w0)
            cts = cts.at[jnp.asarray(wv.n_ct)].set(ct)
    return arena, cts


def _evaluate_tape(
    tape: CompiledTape, arena, bits, cts_in, header_map, frame_base, gid_hi, gid_lo
):
    """Half-gates evaluation: arena (A, 4) active labels + bits (A,) uint8."""
    H = tape.header_size
    for wv in tape.waves:
        if len(wv.f_a):
            ai = _abs_idx(wv.f_a, header_map, frame_base, H)
            bi = _abs_idx(wv.f_b, header_map, frame_base, H)
            la, lb = arena[ai], arena[bi]
            va, vb = bits[ai], bits[bi]
            bm = jnp.asarray(_mask32(wv.f_bmask))
            bm1 = jnp.asarray(wv.f_bmask)
            out_l = la ^ (lb & bm)
            out_v = va ^ (vb & bm1) ^ jnp.asarray(wv.f_flip)
            ci = frame_base + jnp.asarray(wv.f_c)
            arena = arena.at[ci].set(out_l)
            bits = bits.at[ci].set(out_v)
        if len(wv.n_a):
            ai = _abs_idx(wv.n_a, header_map, frame_base, H)
            bi = _abs_idx(wv.n_b, header_map, frame_base, H)
            la, lb = arena[ai], arena[bi]
            va, vb = bits[ai], bits[bi]
            hi, lo = _local_gid64(gid_hi, gid_lo, wv.n_gid)
            tw = tweak_words(hi, lo, xp=jnp)
            blocks, _ = _pad32(la ^ tw)
            h = aes_encrypt_words(blocks, xp=jnp)[: len(wv.n_a)]
            ct = cts_in[jnp.asarray(wv.n_ct)]
            use = (va != jnp.asarray(wv.n_aa)).astype(jnp.uint32)[:, None] * jnp.uint32(
                0xFFFFFFFF
            )
            out_l = jnp.where(use.astype(bool), ct ^ h ^ lb, h)
            tt = jnp.asarray(wv.n_tt)
            out_v = ((tt >> (va * 2 + vb)) & 1).astype(jnp.uint8)
            ci = frame_base + jnp.asarray(wv.n_c)
            arena = arena.at[ci].set(out_l)
            bits = bits.at[ci].set(out_v)
    return arena, bits


# ----------------------------------------------------------------------
# Output scatter shared by modes
# ----------------------------------------------------------------------


def _scatter_outputs(tape: CompiledTape, arena, header_map, frame_base, outputs_map):
    if len(tape.out_ops) == 0:
        return arena
    src = _abs_idx(tape.out_ops, header_map, frame_base, tape.header_size)
    return arena.at[jnp.asarray(outputs_map)].set(arena[src])


# ----------------------------------------------------------------------
# Executors
# ----------------------------------------------------------------------


class PlanExecutor:
    """Runs a linked Plan in one of the three modes.

    Jitted step functions are cached per (tape id, mode) — every instance and
    every step reusing a tape shares one compilation.
    """

    def __init__(self, plan: Plan, batch: int | None = None):
        self.plan = plan
        self.batch = batch  # None = unbatched
        self._fns: dict = {}

    # -- jit caches ----------------------------------------------------

    def _fn(self, tape: CompiledTape, mode: str):
        key = (id(tape), mode)
        fn = self._fns.get(key)
        if fn is not None:
            return fn

        if mode == "execute":

            def step(arena, header_map, outputs_map, frame_base):
                arena = _execute_tape(tape, arena, header_map, frame_base)
                return _scatter_outputs(tape, arena, header_map, frame_base, outputs_map)

            if self.batch:
                step = jax.vmap(step, in_axes=(0, None, None, None))
            fn = jax.jit(step, donate_argnums=(0,))
        elif mode == "garble":

            def step(arena, header_map, outputs_map, frame_base, delta, gid_hi, gid_lo):
                arena, cts = _garble_tape(
                    tape, arena, header_map, frame_base, delta, gid_hi, gid_lo
                )
                arena = _scatter_outputs(tape, arena, header_map, frame_base, outputs_map)
                return arena, cts

            if self.batch:
                step = jax.vmap(step, in_axes=(0, None, None, None, 0, None, None))
            fn = jax.jit(step, donate_argnums=(0,))
        elif mode == "evaluate":

            def step(arena, bits, cts_in, header_map, outputs_map, frame_base, gid_hi, gid_lo):
                arena, bits = _evaluate_tape(
                    tape, arena, bits, cts_in, header_map, frame_base, gid_hi, gid_lo
                )
                src = _abs_idx(tape.out_ops, header_map, frame_base, tape.header_size)
                om = jnp.asarray(outputs_map)
                if len(tape.out_ops):
                    arena = arena.at[om].set(arena[src])
                    bits = bits.at[om].set(bits[src])
                return arena, bits

            if self.batch:
                step = jax.vmap(step, in_axes=(0, 0, 0, None, None, None, None, None))
            fn = jax.jit(step, donate_argnums=(0, 1))
        else:
            raise ValueError(mode)
        self._fns[key] = fn
        return fn

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
        for st in plan.steps:
            if isinstance(st, TapeStep):
                fn = self._fn(st.tape, "execute")
                arena = fn(arena, jnp.asarray(st.header_map), jnp.asarray(st.outputs_map), st.frame_base)
            else:
                arena = self._copy_fn(len(st.src), "execute")(
                    arena, jnp.asarray(st.src), jnp.asarray(st.dst)
                )
        arena = np.asarray(arena)
        return arena[..., plan.output_abs]

    def garble(self, input_label0s, delta, false_label0, true_label0, ct_handler=None):
        """Garble one (or a batch of) instances.

        ``input_label0s``: (n_inputs, 4) or (B, n_inputs, 4) uint32 words;
        ``delta``: (4,) or (B, 4).  ``ct_handler(step_cts)`` receives each
        step's ciphertext block (ct_count_step, 4) (or with leading batch
        axis) in stream order.  Returns (output_label0s, arena).
        """
        plan = self.plan
        batched = self.batch
        shape = (batched, plan.arena_size, 4) if batched else (plan.arena_size, 4)
        arena = np.zeros(shape, dtype=np.uint32)
        arena[..., 0, :] = false_label0
        arena[..., 1, :] = true_label0
        arena[..., plan.input_abs, :] = input_label0s
        arena = jnp.asarray(arena)
        delta = jnp.asarray(delta, dtype=jnp.uint32)
        for st in plan.steps:
            if isinstance(st, TapeStep):
                fn = self._fn(st.tape, "garble")
                gid_hi = jnp.uint32(st.gid_base >> 32)
                gid_lo = jnp.uint32(st.gid_base & 0xFFFFFFFF)
                arena, cts = fn(
                    arena,
                    jnp.asarray(st.header_map),
                    jnp.asarray(st.outputs_map),
                    st.frame_base,
                    delta,
                    gid_hi,
                    gid_lo,
                )
                if ct_handler is not None and st.tape.ct_count:
                    ct_handler(cts[..., : st.tape.ct_count, :])
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
        for st in plan.steps:
            if isinstance(st, TapeStep):
                fn = self._fn(st.tape, "evaluate")
                if st.tape.ct_count == 0:
                    cts_in = np.zeros(
                        (self.batch, 1, 4) if batched else (1, 4), dtype=np.uint32
                    )
                else:
                    cts_in = ct_source(st.ct_base, st.tape.ct_count)
                gid_hi = jnp.uint32(st.gid_base >> 32)
                gid_lo = jnp.uint32(st.gid_base & 0xFFFFFFFF)
                arena, bits = fn(
                    arena,
                    bits,
                    jnp.asarray(cts_in),
                    jnp.asarray(st.header_map),
                    jnp.asarray(st.outputs_map),
                    st.frame_base,
                    gid_hi,
                    gid_lo,
                )
            else:
                arena, bits = self._copy_fn(len(st.src), "evaluate")(
                    arena, bits, jnp.asarray(st.src), jnp.asarray(st.dst)
                )
        return (
            np.asarray(arena[..., plan.output_abs, :]),
            np.asarray(bits[..., plan.output_abs]),
        )
