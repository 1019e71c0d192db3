"""Intra-instance multi-chip sharding (SURVEY §2.7's second axis).

`sharding.py` scales the cut-and-choose *batch* across chips (the rayon-pool
analogue of the reference's instance parallelism, cut_and_choose/mod.rs:131).
This module shards work INSIDE one instance and moves ciphertexts BETWEEN
chips — the two axes the reference has no counterpart for and that SURVEY
§2.7 / BASELINE map to TPU model-parallelism + ICI collectives:

1. ``IntraShardExecutor`` — one instance's GroupPlan with every multi-site
   group's sites block-sharded over a mesh axis via ``shard_map``: each chip
   garbles a contiguous block of the group's S sites against a replicated
   slot arena.  Correctness hinges on three structural facts:

   - sites write disjoint arena slots (schedule.py value renaming + disjoint
     scratch frames), so arena writes merge with a ``pmax`` all-reduce over
     write-deltas ``a1 ^ a0`` (at most one chip holds a nonzero delta per
     slot; identical replicated deltas are also absorbed);
   - the stream commitment is an associative XOR fold over position-tweaked
     AES (runtime._digest_update_rows), so each chip folds its local
     ciphertext block with GLOBAL row tweaks and the partials XOR-combine
     via ``all_gather``;
   - per-site gate-id/ciphertext bases are the original sequential ones, so
     the reassembled stream is bit-identical to the single-device
     GroupExecutor (and therefore to the sequential PlanExecutor and the
     interpreter oracle).

   The arena all-reduce is the correctness-first formulation; a
   bandwidth-optimal deployment would shard the arena itself and gather
   reads (tracked in docs/perf-model.md).

2. ``cross_chip_2pc`` — garbler-chip → evaluator-chip ciphertext movement
   over the interconnect: a ``('role',)`` mesh runs the garble body on role
   0 and the evaluate body on role 1 inside one SPMD program; every group's
   ciphertext buffer crosses the mesh via ``ppermute``, is digest-folded on
   BOTH sides, and is consumed by the evaluator without ever touching the
   host.  (Both roles trace both bodies — SPMD — so each chip does 2x
   compute; a production pipeline would overlap garble(i+1) with
   evaluate(i).  Note this in-process dryrun holds Δ in replicated host
   memory; the multi-host deployment keeps garbler secrets on the garbler
   process — see examples/multihost_cut_and_choose.py.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import functools

try:
    # check_vma=False: group bodies mix replicated and per-device values in
    # fori_loop carries (sound here — merges are explicit pmax/all_gather)
    shard_map = functools.partial(jax.shard_map, check_vma=False)
    jax.shard_map  # noqa: B018
except AttributeError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gsv_tpu.circuit.link import CopyStep
from gsv_tpu.circuit.runtime import (
    _TRASH,
    _abs_idx_g,
    _digest_update,
    _digest_update_rows,
    _evaluate_group_segs_into,
    _garble_group_segs_into,
    _scatter_outputs_g,
    padded_seg_args_group,
    tape_signature,
)
from gsv_tpu.circuit.schedule import GroupStep


def _group_consts(g: GroupStep, meta):
    """Padded per-group host arrays in the GroupExecutor layout."""
    Hb, ob, ctb = meta["Hb"], meta["ob"], meta["ctb"]
    S = g.header_maps.shape[0]
    hm = np.full((S, Hb), _TRASH, dtype=np.int32)
    hm[:, : g.header_maps.shape[1]] = g.header_maps
    om = np.full((S, max(ob, 1)), _TRASH, dtype=np.int32)
    if g.outputs_maps.shape[1]:
        om[:, : g.outputs_maps.shape[1]] = g.outputs_maps
    fb = g.frame_bases.astype(np.int32)
    ghi = (g.gid_bases >> 32).astype(np.uint32)
    glo = (g.gid_bases & 0xFFFFFFFF).astype(np.uint32)
    return hm, om, fb, ghi, glo, S, ctb


class IntraShardExecutor:
    """Garble ONE instance with multi-site groups sharded across the mesh.

    Groups whose site count S is a multiple of the mesh axis size run
    site-sharded (S/n sites per chip); smaller groups and CopySteps run
    replicated (every chip computes the identical update).  Outputs, the
    ciphertext stream (via ``ct_handler(group, body, meta)`` — ``body`` is
    the (S*ctb, 4) buffer WITHOUT the trash row, rows sharded across the
    mesh) and the commitment digest are bit-identical to
    ``GroupExecutor(gplan).garble(...)``.
    """

    def __init__(self, gplan, mesh: Mesh, axis: str = "sites",
                 hasher: str = "aes"):
        self.plan = gplan
        self.mesh = mesh
        self.axis = axis
        self.n = mesh.shape[axis]
        self.hasher = hasher
        self._dev: dict = {}
        self._repl = NamedSharding(mesh, P())
        self._shard0 = NamedSharding(mesh, P(axis))

    # -- per-shape traced programs ---------------------------------------

    def _sharded_fn(self, S: int, ctb: int, sig):
        key = ("s", sig, S)
        fn = self._dev.get(key)
        if fn is not None:
            return fn
        n, axis, hasher = self.n, self.axis, self.hasher
        S_l = S // n
        mesh = self.mesh

        def local(arena, hm, om, oo, fb, delta, ghi, glo, ct_loc, digest,
                  gid, segs):
            a0 = arena
            cts = jnp.zeros((S_l * ctb + 1, 4), jnp.uint32)
            a1, cts = _garble_group_segs_into(
                a0, cts, hm, fb, delta, ghi, glo, ct_loc, segs, hasher)
            a1 = _scatter_outputs_g(a1, hm, fb, om, oo)
            merged = a0 ^ jax.lax.pmax(a1 ^ a0, axis)
            body = cts[:-1]
            row0 = (jax.lax.axis_index(axis) * (S_l * ctb)).astype(jnp.uint32)
            part = _digest_update_rows(jnp.zeros((4,), jnp.uint32), body,
                                       gid, row0)
            parts = jax.lax.all_gather(part, axis)
            fold = jax.lax.reduce(parts, jnp.uint32(0), jax.lax.bitwise_xor,
                                  dimensions=(0,))
            return merged, body, digest ^ fold

        sh = P(axis)
        fn = jax.jit(shard_map(
            local, mesh=mesh,
            in_specs=(P(), sh, sh, P(), sh, P(), sh, sh, sh, P(), P(), P()),
            out_specs=(P(), sh, P()),
        ), static_argnums=())
        self._dev[key] = fn
        return fn

    def _repl_fn(self, sig):
        """Replicated (un-sharded) group program for S not divisible by n."""
        from gsv_tpu.circuit.runtime import _generic_group_jit

        return _generic_group_jit("garble", self.hasher, None, commit=True,
                                  emit_cts=True)

    def _copy_fn(self):
        fn = self._dev.get("copy")
        if fn is None:
            fn = jax.jit(lambda a, s, d: a.at[d].set(a[s]))
            self._dev["copy"] = fn
        return fn

    def _put(self, arr, sharding):
        return jax.device_put(np.asarray(arr), sharding)

    # -- driver -----------------------------------------------------------

    def garble(self, input_label0s, delta, false_label0, true_label0,
               ct_handler=None, commit: bool = False):
        plan = self.plan
        repl = self._repl
        arena = np.zeros((plan.arena_size, 4), dtype=np.uint32)
        arena[0] = false_label0
        arena[1] = true_label0
        arena[plan.input_abs] = input_label0s
        arena = self._put(arena, repl)
        delta = self._put(np.asarray(delta, np.uint32), repl)
        digest = self._put(np.zeros((4,), np.uint32), repl)

        for gi, g in enumerate(plan.steps):
            if isinstance(g, CopyStep):
                src, dst = self._cached(("cp", gi), lambda: (
                    self._put(g.src, repl), self._put(g.dst, repl)))
                arena = self._copy_fn()(arena, src, dst)
                continue
            segs, oo, meta = self._segs(g.tape)
            sig = tape_signature(g.tape)
            S = g.header_maps.shape[0]
            if S % self.n == 0 and S >= self.n:
                hm, om, fb, ghi, glo, ct_loc = self._cached(
                    ("g", gi), lambda: self._sharded_consts(g, meta))
                fn = self._sharded_fn(S, meta["ctb"], sig)
                arena, body, digest = fn(arena, hm, om, oo, fb, delta, ghi,
                                         glo, ct_loc, digest,
                                         jnp.uint32(gi), segs)
                if ct_handler is not None and g.tape.ct_count:
                    ct_handler(g, body, meta)
            else:
                hm, om, fb, ghi, glo, ct_loc, token = self._cached(
                    ("g", gi), lambda: self._repl_consts(g, meta))
                fn = self._repl_fn(sig)
                arena, cts, digest = fn(arena, token, hm, om, oo, fb, delta,
                                        ghi, glo, ct_loc, digest,
                                        jnp.uint32(gi), segs)
                if ct_handler is not None and g.tape.ct_count:
                    ct_handler(g, cts[:-1], meta)
        out = np.asarray(arena[jnp.asarray(plan.output_abs)])
        return out, arena, (np.asarray(digest) if commit else None)

    # -- cached device constants ------------------------------------------

    def _cached(self, key, build):
        v = self._dev.get(key)
        if v is None:
            v = build()
            self._dev[key] = v
        return v

    def _segs(self, tape):
        key = ("segs", tape.content_key)
        v = self._dev.get(key)
        if v is None:
            segs_np, oo_np, meta = padded_seg_args_group(tape)
            segs = [{f: self._put(a, self._repl) for f, a in d.items()}
                    for d in segs_np]
            v = (segs, self._put(oo_np, self._repl), meta)
            self._dev[key] = v
        return v

    def _sharded_consts(self, g, meta):
        hm, om, fb, ghi, glo, S, ctb = _group_consts(g, meta)
        S_l = S // self.n
        # LOCAL ciphertext offsets: site s lands at (s % S_l)*ctb on its
        # chip; pad sites (s >= n_real) scatter to the LOCAL trash row.
        ct_loc = np.where(
            np.arange(S) < g.n_real,
            (np.arange(S) % S_l) * ctb,
            S_l * ctb,
        ).astype(np.int32)
        sh = self._shard0
        return (self._put(hm, sh), self._put(om, sh), self._put(fb, sh),
                self._put(ghi, sh), self._put(glo, sh), self._put(ct_loc, sh))

    def _repl_consts(self, g, meta):
        hm, om, fb, ghi, glo, S, ctb = _group_consts(g, meta)
        trash = S * ctb
        ct_loc = np.where(np.arange(S) < g.n_real,
                          np.arange(S, dtype=np.int64) * ctb,
                          trash).astype(np.int32)
        repl = self._repl
        token = self._put(np.zeros((trash + 1, 0), np.uint32), repl)
        return (self._put(hm, repl), self._put(om, repl), self._put(fb, repl),
                self._put(ghi, repl), self._put(glo, repl),
                self._put(ct_loc, repl), token)


def cross_chip_2pc(gplan, mesh: Mesh, input_label0s, input_bits, delta,
                   false_label0, true_label0, axis: str = "role",
                   hasher: str = "aes"):
    """Full garble→evaluate 2PC with the ciphertext stream crossing the mesh.

    ``mesh`` must have a 2-wide ``axis``: device 0 is the garbler, device 1
    the evaluator.  Per group, the garbler's ciphertext buffer moves to the
    evaluator via ``ppermute`` inside the SPMD program and is consumed
    device-side; both roles fold the commitment digest over the stream they
    produced/consumed.  Returns garbler output label0s, evaluator active
    labels + plaintext values, and both digests (equal iff the evaluator
    consumed exactly what the garbler produced).
    """
    assert mesh.shape[axis] == 2
    repl = NamedSharding(mesh, P())
    role0 = NamedSharding(mesh, P(axis))

    A = gplan.arena_size
    g_arena = np.zeros((A, 4), np.uint32)
    g_arena[0] = false_label0
    g_arena[1] = true_label0
    g_arena[gplan.input_abs] = input_label0s
    e_arena = np.zeros((A, 4), np.uint32)
    e_arena[0] = false_label0
    e_arena[1] = np.asarray(true_label0) ^ np.asarray(delta)
    active = np.asarray(input_label0s) ^ np.where(
        np.asarray(input_bits, np.uint32)[:, None], np.asarray(delta)[None], 0)
    e_arena[gplan.input_abs] = active
    e_bits = np.zeros((A,), np.uint8)
    e_bits[1] = 1
    e_bits[gplan.input_abs] = input_bits

    st_a = jax.device_put(np.stack([g_arena, e_arena]), role0)
    st_b = jax.device_put(np.stack([np.zeros((A,), np.uint8), e_bits]), role0)
    st_gd = jax.device_put(np.zeros((2, 4), np.uint32), role0)
    st_ed = jax.device_put(np.zeros((2, 4), np.uint32), role0)
    delta_d = jax.device_put(np.asarray(delta, np.uint32), repl)

    fns: dict = {}

    def step_fn(S: int, ctb: int, Hb: int, sig):
        key = (sig, S)
        fn = fns.get(key)
        if fn is not None:
            return fn

        def local(ast, bst, hm, om, oo, fb, dl, ghi, glo, ct_loc, gd, ed,
                  gid, segs):
            arena, bits = ast[0], bst[0]
            cts = jnp.zeros((S * ctb + 1, 4), jnp.uint32)
            ga, cts = _garble_group_segs_into(
                arena, cts, hm, fb, dl, ghi, glo, ct_loc, segs, hasher)
            ga = _scatter_outputs_g(ga, hm, fb, om, oo)
            gd0 = _digest_update(gd[0], cts, gid)
            # the stream crosses the interconnect: garbler -> evaluator
            rx = jax.lax.ppermute(cts, axis, [(0, 1)])
            ea, eb = _evaluate_group_segs_into(
                arena, bits, rx, hm, fb, ghi, glo, ct_loc, segs, hasher)
            if oo.shape[0]:
                src = _abs_idx_g(oo, hm, fb, hm.shape[1])
                ea = ea.at[om].set(ea[src])
                eb = eb.at[om].set(eb[src])
            ed0 = _digest_update(ed[0], rx, gid)
            r = jax.lax.axis_index(axis)
            na = jnp.where(r == 0, ga, ea)
            return na[None], eb[None], gd0[None], ed0[None]

        sh = P(axis)
        fn = jax.jit(shard_map(
            local, mesh=mesh,
            in_specs=(sh, sh, P(), P(), P(), P(), P(), P(), P(), P(), sh,
                      sh, P(), P()),
            out_specs=(sh, sh, sh, sh),
        ))
        fns[key] = fn
        return fn

    def copy_fn():
        fn = fns.get("copy")
        if fn is None:
            cp = jax.vmap(
                lambda a, b, s, d: (a.at[d].set(a[s]), b.at[d].set(b[s])),
                in_axes=(0, 0, None, None))
            fn = jax.jit(cp)
            fns["copy"] = fn
        return fn

    segs_cache: dict = {}
    for gi, g in enumerate(gplan.steps):
        if isinstance(g, CopyStep):
            st_a, st_b = copy_fn()(st_a, st_b,
                                   jax.device_put(g.src, repl),
                                   jax.device_put(g.dst, repl))
            continue
        ck = g.tape.content_key
        if ck not in segs_cache:
            segs_np, oo_np, meta = padded_seg_args_group(g.tape)
            segs_cache[ck] = (
                [{f: jax.device_put(a, repl) for f, a in d.items()}
                 for d in segs_np],
                jax.device_put(oo_np, repl), meta)
        segs, oo, meta = segs_cache[ck]
        hm, om, fb, ghi, glo, S, ctb = _group_consts(g, meta)
        trash = S * ctb
        ct_loc = np.where(np.arange(S) < g.n_real,
                          np.arange(S, dtype=np.int64) * ctb,
                          trash).astype(np.int32)
        fn = step_fn(S, ctb, meta["Hb"], tape_signature(g.tape))
        st_a, st_b, st_gd, st_ed = fn(
            st_a, st_b,
            jax.device_put(hm, repl), jax.device_put(om, repl), oo,
            jax.device_put(fb, repl), delta_d,
            jax.device_put(ghi, repl), jax.device_put(glo, repl),
            jax.device_put(ct_loc, repl), st_gd, st_ed,
            jnp.uint32(gi), segs)

    out_abs = np.asarray(gplan.output_abs)
    st_a = np.asarray(st_a)
    st_b = np.asarray(st_b)
    return {
        "garble_out_label0s": st_a[0][out_abs],
        "eval_labels": st_a[1][out_abs],
        "eval_values": st_b[1][out_abs],
        "garble_digest": np.asarray(st_gd)[0],
        "evaluate_digest": np.asarray(st_ed)[1],
    }
