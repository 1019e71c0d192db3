"""Mega-dispatch: the grouped garble pass as a handful of device programs.

Per-dispatch remote-execution overhead (~150-250 ms through the tunneled
PJRT client) dominates the ~44k-dispatch grouped plan — the r4 honest bench
measured ~50-65M gates/s with compute floors ~10x higher (docs/perf-model.md
"Dispatch overhead, not AES").  TPU-native fix: fold runs of group dispatches
into ONE jitted program — ``lax.scan`` over a step sequence whose body is a
``lax.switch`` across the plan's hot tape signatures, with every per-step
constant staged in per-branch device arrays passed as program arguments
and indexed by the scan position (see MegaStaging for why NOT one pool).

The branch set covers the top-K signatures by dispatch count (top-40 cover
98.7% of v3-plan dispatches) plus pow2-bucketed copy branches and a no-op
padding branch; fat/rare signatures stay individual dispatches between scan
chunks.  A fixed CHUNK length keeps it to ONE compiled program per
(hasher, batch, plan) reused for every chunk.

Bit-exactness: branches call the same ``_group_step_fn`` body the
sequential executor jits, in the same plan order, so labels, gate ids and
the chained digest are identical (tested vs ``GroupExecutor.garble``).

Reference parity: this is the dispatch-side replacement for the streaming
loop in the reference's ``src/circuit/streaming_mode.rs`` — same
garble-side semantics, scheduled TPU-first.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from gsv_tpu.circuit.runtime import (
    _generic_group_jit_wm,
    _group_step_fn,
    _group_step_fn_wm,
    _pallas_hasher_tag,
    h2d,
    padded_seg_args_group,
    tape_signature,
)
from gsv_tpu.circuit.schedule import GroupStep

_MEGA_JITS: dict = {}


def group_dev_s1pad(ex, g, gi: int):
    """Device maps for an S=1 group, padded to S=2 for the standalone wm
    program.

    The standalone wm group program deterministically crashes the TPU
    runtime on S=1 shapes (r5: scripts/repro_s1_crash.py — gi 5579/517/569
    all die, the XLA-hash variant too, so it is an XLA fault, not Mosaic;
    S>=2 shapes and the mega program's chunk-0 execution are fine).  The
    workaround dispatches S=1 groups as S=2 with one scheduler-convention
    dead site: TRASH header/output rows (schedule.py pads real groups the
    same way), gid base 0, its own dead scratch frame, and — key to
    bit-exactness — the SAME S=1 ciphertext token, so every pad-site ct
    write clamps onto the existing trash row and the digest fold is
    bit-identical to the S=1 program's."""
    key = ("gmaps_s1pad", id(g))
    dev = ex._dev.get(key)
    if dev is not None:
        return dev
    from gsv_tpu.circuit.runtime import _TRASH

    if ex.packed:
        meta = ex._seg_dev_packed(g.tape)[4]
    else:
        _, _, meta = ex._seg_dev(g.tape)
    hm, om, fb, ghi, glo, ct_loc, trash_row = ex._group_maps_np(g, meta)
    fs = g.tape.frame_size
    pad_fb = int(fb[0]) + fs
    # the scratch region is sized max(S*frame_size) over groups, so a
    # second frame always fits for the (small) S=1 stragglers
    assert pad_fb + fs <= ex.plan.arena_size, (pad_fb, fs, ex.plan.arena_size)
    dev = (
        h2d(np.concatenate([hm, np.full((1, hm.shape[1]), _TRASH, hm.dtype)])),
        h2d(np.concatenate([om, np.full((1, om.shape[1]), _TRASH, om.dtype)])),
        jnp.asarray(np.array([int(fb[0]), pad_fb], fb.dtype)),
        jnp.asarray(np.array([int(ghi[0]), 0], np.uint32)),
        jnp.asarray(np.array([int(glo[0]), 0], np.uint32)),
        jnp.asarray(np.array([int(ct_loc[0]), trash_row], np.int32)),
        ex._token(trash_row),
        jnp.uint32(gi),
    )
    ex._dev[key] = dev
    return dev


def _wm_group_dev(ex, g, gi: int):
    """ex._group_dev, with the S=1 -> S=2 pad for the standalone wm path."""
    if g.header_maps.shape[0] == 1:
        return group_dev_s1pad(ex, g, gi)
    return ex._group_dev(g, gi)


def _wm_copy():
    """Jitted copy step on the word-major (4, B, A) arena."""
    fn = _MEGA_JITS.get("wmcopy")
    if fn is None:
        fn = jax.jit(lambda a, s, d: a.at[:, d].set(a[:, s]),
                     donate_argnums=(0,))
        _MEGA_JITS["wmcopy"] = fn
    return fn


def _bucket_pow2(n: int, lo: int = 8) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


@dataclass
class MegaStaging:
    """Host-side staging of a plan for mega dispatch (see build_mega).

    Per-branch constants are SEPARATE arrays passed as program arguments
    (``arrays``, flat in layout order) — NOT packed into one flat pool.
    r5 lesson: with two flat pools, XLA merged the per-branch slice views
    into one synthesized gather over the whole pool reshaped to a
    2-element-minor shape, whose (8,128) tiling padded 2 -> 128 lanes and
    blew buffer assignment (36.8GB for a 575MB pool).  Distinct parameters
    cannot be merged across branches."""

    layout: tuple  # static spec (shapes/dtypes/meta), hashable — jit key
    arrays: list  # per-branch host arrays, flat, in layout walk order
    bidx: np.ndarray  # (n_chunks, chunk) int32 branch id per scan step
    pos: np.ndarray  # (n_chunks, chunk) int32 index into the branch's arrays
    chunk_gates: np.ndarray  # (n_chunks,) int64 aggregate gates per chunk
    # plan walk: interleaved ("mega", chunk_id) / ("step", plan_index)
    schedule: list = field(default_factory=list)
    n_branch_steps: int = 0
    n_excluded: int = 0
    # (tape_signature, S) keys NOT covered by a switch branch — these stay
    # individual dispatches and are the only per-signature programs a
    # mega-dispatch pass still needs warm (see preload_mega)
    excluded_sigs: tuple = ()


def build_mega(plan, top_k: int = 40, chunk: int = 256) -> MegaStaging:
    """Stage ``plan`` for mega dispatch.

    Branch ids: 0 = no-op (chunk padding), 1..n_sig = hot tape signatures,
    then one branch per pow2 copy-length bucket.  Steps not covered (rare /
    fat signatures beyond ``top_k``) break the scan into runs; each run is
    chunked to ``chunk`` scan steps with no-op padding.
    """
    from collections import Counter

    from gsv_tpu.circuit.runtime import GroupExecutor

    _group_maps_np = GroupExecutor._group_maps_np

    sig_of = {}
    counts = Counter()
    for g in plan.steps:
        if isinstance(g, GroupStep):
            k = (tape_signature(g.tape), g.header_maps.shape[0])
            sig_of[id(g)] = k
            counts[k] += 1
    hot = [k for k, _ in counts.most_common(top_k)]
    sid = {k: i + 1 for i, k in enumerate(hot)}  # 0 is the no-op branch

    # -- collect per-branch pools (host) ---------------------------------
    maps: dict = {k: {f: [] for f in
                      ("hm", "om", "fb", "ghi", "glo", "ctl", "gid", "cidx")}
                  for k in hot}
    contents: dict = {k: {} for k in hot}  # content_key -> row
    seg_meta: dict = {}  # sig key -> (segs_shapes, oo, meta) from first tape
    copy_buckets: dict = {}  # L -> {"src": [], "dst": []}
    copy_rows: dict = {}
    steps_branch = np.full(len(plan.steps), -1, np.int32)
    steps_pos = np.zeros(len(plan.steps), np.int32)
    step_gates = np.zeros(len(plan.steps), np.int64)

    host_segs: dict = {}

    def seg_host(tape):
        ck = tape.content_key
        if ck not in host_segs:
            host_segs[ck] = padded_seg_args_group(tape)
        return host_segs[ck]

    for gi, g in enumerate(plan.steps):
        if isinstance(g, GroupStep):
            k = sig_of[id(g)]
            step_gates[gi] = g.tape.total_gates * g.n_real
            if k not in sid:
                continue  # excluded: stays an individual dispatch
            segs_np, oo_np, meta = seg_host(g.tape)
            seg_meta.setdefault(k, (segs_np, oo_np, meta))
            hm, om, fb, ghi, glo, ctl, tr = _group_maps_np(g, meta)
            m = maps[k]
            cpool = contents[k]
            ck = g.tape.content_key
            if ck not in cpool:
                cpool[ck] = (len(cpool), segs_np, oo_np)
            m["hm"].append(hm)
            m["om"].append(om)
            m["fb"].append(fb)
            m["ghi"].append(ghi)
            m["glo"].append(glo)
            m["ctl"].append(ctl)
            m["gid"].append(np.uint32(gi))
            m["cidx"].append(np.int32(cpool[ck][0]))
            steps_branch[gi] = sid[k]
            steps_pos[gi] = len(m["hm"]) - 1
        else:  # copy step
            src = np.asarray(g.src, np.int32)
            dst = np.asarray(g.dst, np.int32)
            L = _bucket_pow2(len(src))
            b = copy_buckets.setdefault(L, {"src": [], "dst": []})
            pad = L - len(src)
            if pad:
                # slot 0 -> slot 0 self-copy: an exact no-op on the arena
                src = np.concatenate([src, np.zeros(pad, np.int32)])
                dst = np.concatenate([dst, np.zeros(pad, np.int32)])
            b["src"].append(src)
            b["dst"].append(dst)
            copy_rows.setdefault(L, []).append(gi)
            steps_branch[gi] = -2 - len(copy_buckets)  # resolved below
            steps_pos[gi] = len(b["src"]) - 1

    copy_sid = {L: len(hot) + 1 + i
                for i, L in enumerate(sorted(copy_buckets))}
    for L, rows in copy_rows.items():
        for n, gi in enumerate(rows):
            steps_branch[gi] = copy_sid[L]
            steps_pos[gi] = n

    # -- per-branch argument arrays with a static layout spec ------------
    # (separate parameters, deliberately NOT one flat pool — see
    # MegaStaging docstring)
    arrays: list = []

    def put(arr):
        arr = np.ascontiguousarray(arr)
        arrays.append(arr)
        return (len(arrays) - 1, arr.shape, arr.dtype.name)

    layout = []
    for k in hot:
        m = maps[k]
        segs_np, oo_np, meta = seg_meta[k]
        # stacked per-step maps are stored 2-D/1-D with the count and S
        # dims MERGED ((count*S, Hb) / (count*S,)) and extracted with
        # lax.dynamic_slice at (k*S, ...): a 3-D (count, S, Hb) parameter
        # made the TPU compiler choose an S-minor layout whose (8,128)
        # tiling cost a ~30x relayout temp per array (r5 OOM breakdown)
        ent = {}
        for f in ("hm", "om", "fb", "ghi", "glo", "ctl", "gid", "cidx"):
            a = np.stack(m[f]).astype(
                np.uint32 if f in ("ghi", "glo", "gid") else np.int32)
            if a.ndim == 3:
                a = a.reshape(a.shape[0] * a.shape[1], a.shape[2])
            elif a.ndim == 2:
                a = a.reshape(-1)
            ent[f] = put(a)
        # content pools: rows ordered by first-seen index
        rows = sorted(contents[k].values())
        oo_pool = np.stack([oo.astype(np.int32) for _, _, oo in rows]) \
            if oo_np.shape[0] else np.zeros((len(rows), 0), np.int32)
        ent["oo"] = put(oo_pool)
        seg_l = []
        for si in range(len(segs_np)):
            fl = []
            for f, a0 in segs_np[si].items():
                stacked = np.stack([segs[si][f] for _, segs, _ in rows])
                fl.append((f, put(stacked)))
            seg_l.append(tuple(fl))
        ent["segs"] = tuple(seg_l)
        S = k[1]
        ent["S"] = S
        ent["ctb"] = meta["ctb"]
        ent["n_out"] = meta["n_out"]
        layout.append(
            ("sig", tuple(sorted((f, v) for f, v in ent.items()
                                 if f not in ("segs",))), ent["segs"]))
    for L in sorted(copy_buckets):
        b = copy_buckets[L]
        layout.append(("copy",
                       put(np.stack(b["src"])), put(np.stack(b["dst"]))))

    # -- chunk the covered runs ------------------------------------------
    bidx_rows, pos_rows, gate_rows, schedule = [], [], [], []
    i, n = 0, len(plan.steps)
    while i < n:
        if steps_branch[i] < 0:
            schedule.append(("step", i))
            i += 1
            continue
        j = i
        while j < n and steps_branch[j] >= 0:
            j += 1
        for a in range(i, j, chunk):
            b = min(a + chunk, j)
            brow = np.zeros(chunk, np.int32)
            prow = np.zeros(chunk, np.int32)
            brow[: b - a] = steps_branch[a:b]
            prow[: b - a] = steps_pos[a:b]
            schedule.append(("mega", len(bidx_rows)))
            bidx_rows.append(brow)
            pos_rows.append(prow)
            gate_rows.append(int(step_gates[a:b].sum()))
        i = j
    n_excluded = int(np.sum(steps_branch < 0))
    excluded_sigs = tuple(k for k in counts if k not in sid)
    return MegaStaging(
        excluded_sigs=excluded_sigs,
        layout=tuple(layout),
        arrays=arrays,
        bidx=np.stack(bidx_rows) if bidx_rows else np.zeros((0, chunk), np.int32),
        pos=np.stack(pos_rows) if pos_rows else np.zeros((0, chunk), np.int32),
        chunk_gates=np.asarray(gate_rows, np.int64),
        schedule=schedule,
        n_branch_steps=int(np.sum(steps_branch >= 0)),
        n_excluded=n_excluded,
    )


def _arg(layout_ent, arrs):
    """The argument array a static layout entry refers to."""
    pos, _shape, _dt = layout_ent
    return arrs[pos]


def mega_jit(hasher: str, batch: int | None, layout: tuple, chunk: int):
    """One jitted scan-over-switch program for every chunk of a plan."""
    # key on the layout tuple itself (hashable), not hash(layout): a Python
    # hash collision between two plans' layouts must not silently reuse a
    # program with wrong pool offsets (advisor r4)
    key = ("mega", hasher, batch, layout, chunk)
    fn = _MEGA_JITS.get(key)
    if fn is not None:
        return fn
    wm = hasher == "aes_wm"
    if wm:
        # word-major arena (4, B, A): batch explicit, no vmap (see the
        # wm section in runtime.py)
        base = _group_step_fn_wm(batch, commit=True)
    else:
        base = _group_step_fn("garble", _pallas_hasher_tag(hasher, batch),
                              batch, commit=True, emit_cts=False)

    def make_sig_branch(flat, seg_layout):
        ent = dict(flat)
        S = ent["S"]

        def br(arena, digest, k, delta, *arrs):
            def row2(f):
                """(S, w) step row from the merged (count*S, w) param."""
                a = _arg(ent[f], arrs)
                return lax.dynamic_slice(a, (k * S, 0), (S, a.shape[1]))

            def row1(f):
                a = _arg(ent[f], arrs)
                return lax.dynamic_slice(a, (k * S,), (S,))

            hm = row2("hm")
            om = row2("om")
            fb = row1("fb")
            ghi = row1("ghi")
            glo = row1("glo")
            ctl = row1("ctl")
            gid = _arg(ent["gid"], arrs)[k]
            cid = _arg(ent["cidx"], arrs)[k]
            oo = _arg(ent["oo"], arrs)[cid] if ent["n_out"] else \
                jnp.zeros((0,), jnp.int32)
            segs = []
            for seg_l in seg_layout:
                segs.append({f: _arg(le, arrs)[cid] for f, le in seg_l})
            tr = ent["S"] * ent["ctb"]
            token = jnp.zeros((tr + 1, 0), jnp.uint32)
            return base(arena, token, hm, om, oo, fb, delta, ghi, glo,
                        ctl, digest, gid, segs)

        return br

    def make_copy_branch(src_ent, dst_ent):
        def br(arena, digest, k, delta, *arrs):
            src = _arg(src_ent, arrs)[k]
            dst = _arg(dst_ent, arrs)[k]
            if wm:
                return arena.at[:, dst].set(arena[:, src]), digest
            return arena.at[dst].set(arena[src]), digest

        return br

    branches = [lambda arena, digest, k, delta, *arrs: (arena, digest)]
    for ent in layout:
        if ent[0] == "sig":
            branches.append(make_sig_branch(ent[1], ent[2]))
        else:
            branches.append(make_copy_branch(ent[1], ent[2]))

    def mega(arena, digest, delta, brow, prow, *arrs):
        def body(carry, x):
            a, d = carry
            a, d = lax.switch(
                x[0], branches, a, d, x[1], delta, *arrs)
            return (a, d), None

        (arena, digest), _ = lax.scan(
            body, (arena, digest), jnp.stack([brow, prow], axis=1))
        return arena, digest

    if batch and not wm:
        n_arrs = _n_arrays(layout)
        mega = jax.vmap(mega, in_axes=(0, 0, 0) + (None,) * (2 + n_arrs))
    fn = jax.jit(mega, donate_argnums=(0, 1))
    _MEGA_JITS[key] = fn
    return fn


def _n_arrays(layout) -> int:
    """Number of per-branch argument arrays a layout references."""
    hi = -1
    for ent in layout:
        if ent[0] == "sig":
            for _f, v in ent[1]:
                if isinstance(v, tuple) and len(v) == 3:
                    hi = max(hi, v[0])
            for seg_l in ent[2]:
                for _f, v in seg_l:
                    hi = max(hi, v[0])
        else:
            hi = max(hi, ent[1][0], ent[2][0])
    return hi + 1


# ----------------------------------------------------------------------
# Trace cache (jax.export): tracing the ~95-branch switch body through the
# unrolled bitsliced-AES gadgets costs tens of MINUTES of pure Python/
# lowering work — and jax only persists the XLA *compile*, never the trace.
# Serializing the Exported (StableHLO) module to disk makes the trace a
# one-time cost per (code, layout, hasher, batch, chunk): later processes
# deserialize in seconds and jit the restored call (whose XLA compile then
# hits the persistent compile cache).  Committed to git like .jit_cache.
# ----------------------------------------------------------------------

# bump when the traced program semantics change (invalidates trace cache)
_MEGA_CODE_VERSION = 3  # v3: merged-count maps + flat 4B wm shapes
_MEGA_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".mega_cache")


def _mega_cache_path(hasher, batch, layout, chunk, shapes) -> str:
    import hashlib

    import jax

    key = repr((_MEGA_CODE_VERSION, jax.__version__, hasher, batch, layout,
                chunk, shapes)).encode()
    return os.path.join(_MEGA_CACHE_DIR,
                        hashlib.sha256(key).hexdigest()[:24] + ".stablehlo")


def mega_exported(hasher, batch, layout, chunk, shapes):
    """Jitted mega program via the on-disk trace cache.

    ``shapes``: tuple of (shape, dtype-name) pairs for the 7 call args
    (arena, digest, delta, brow, prow, *arrays).  Both the cache-miss and
    cache-hit paths return ``jit(deserialized.call)`` so every process
    compiles the byte-identical StableHLO module — one persistent-cache
    entry serves all runs (an Exported traced here and a fresh jit of the
    Python fn would otherwise key differently)."""
    import time

    import jax

    path = _mega_cache_path(hasher, batch, layout, chunk, shapes)
    key = ("megax", path)
    fn = _MEGA_JITS.get(key)
    if fn is not None:
        return fn
    from jax import export as jexport

    if os.path.exists(path):
        t0 = time.time()
        with open(path, "rb") as fh:
            exp = jexport.deserialize(bytearray(fh.read()))
        print(f"[mega] trace cache hit: {path} "
              f"({time.time()-t0:.0f}s deserialize)", flush=True)
    else:
        t0 = time.time()
        raw = mega_jit(hasher, batch, layout, chunk)
        args = [jax.ShapeDtypeStruct(s, jnp.dtype(d)) for s, d in shapes]
        exp = jexport.export(raw)(*args)
        blob = exp.serialize()
        os.makedirs(_MEGA_CACHE_DIR, exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(blob)
        os.replace(tmp, path)
        print(f"[mega] traced+exported in {time.time()-t0:.0f}s "
              f"({len(blob)/1e6:.0f}MB -> {path})", flush=True)
        exp = jexport.deserialize(bytearray(blob))
    fn = jax.jit(exp.call, donate_argnums=(0, 1))
    _MEGA_JITS[key] = fn
    return fn


def _mega_stage_dev(ex, top_k: int, chunk: int):
    """Staging + device pools + jitted program for ``ex.plan`` (memoised on
    the executor, so preload_mega and mega_garble share one build/upload)."""
    key = ("megastage", top_k, chunk)
    st = ex._dev.get(key)
    if st is None:
        st = build_mega(ex.plan, top_k=top_k, chunk=chunk)
        ex._dev[key] = st
    dkey = ("megadev", top_k, chunk)
    dev = ex._dev.get(dkey)
    if dev is None:
        dev = (tuple(h2d(a) for a in st.arrays), h2d(st.bidx), h2d(st.pos))
        ex._dev[dkey] = dev
    B = ex.batch
    A = ex.arena_size
    if ex.hasher == "aes_wm":
        nb = B or 1
        ash, vsh = (4 * nb, A), (4 * nb,)
    else:
        pre = (B,) if B else ()
        ash, vsh = pre + (A, 4), pre + (4,)
    shapes = (
        (ash, "uint32"),               # arena
        (vsh, "uint32"),               # digest
        (vsh, "uint32"),               # delta
        ((chunk,), "int32"),           # brow
        ((chunk,), "int32"),           # prow
    ) + tuple((a.shape, a.dtype.name) for a in st.arrays)
    # the trace cache was exported without sharding annotations — under an
    # instances mesh, fall back to the direct jit (sharded-arg semantics).
    # Big modules also skip it: jit(deserialized.call) on an ~18MB module
    # burned >50 min of client CPU before ever reaching the compile service
    # (r5) — the direct ~11-min retrace is the cheaper path there.
    max_br = int(os.environ.get("GSV_MEGA_EXPORT_MAX_BRANCHES", "16"))
    if (ex.mesh is None and os.environ.get("GSV_MEGA_EXPORT", "1") == "1"
            and len(st.layout) <= max_br):
        fn = mega_exported(ex.hasher, B, st.layout, chunk, shapes)
    else:
        fn = mega_jit(ex.hasher, B, st.layout, chunk)
    return st, dev, fn


def preload_mega(ex, top_k: int = 40, chunk: int = 256,
                 modes=("garble_nocts",)) -> float:
    """Warm-execute the mega program + the residual per-signature programs.

    The mega pass needs exactly ONE big compiled program per
    (hasher, batch, layout) plus per-signature programs only for the
    excluded (rare/fat) signatures — NOT the full 86-program fill.
    Warm-executes each on throwaway donated buffers through the real
    dispatch path (the only fill that hits the runtime persistent-cache
    key — docs/perf-model.md r4).  Returns wall seconds."""
    import time

    t0 = time.perf_counter()
    st, dev, fn = _mega_stage_dev(ex, top_k, chunk)
    ARRS, BIDX, POS = dev
    B = ex.batch
    A = ex.arena_size
    wm = ex.hasher == "aes_wm"
    nb = B or 1
    if wm:
        arena = jnp.zeros((4 * nb, A), jnp.uint32)
        delta = jnp.zeros((4 * nb,), jnp.uint32)
        digest = jnp.zeros((4 * nb,), jnp.uint32)
    else:
        arena = jnp.zeros((B, A, 4) if B else (A, 4), jnp.uint32)
        delta = jnp.zeros((B, 4) if B else (4,), jnp.uint32)
        digest = jnp.zeros((B, 4) if B else (4,), jnp.uint32)
    if st.bidx.shape[0]:
        arena, digest = fn(arena, digest, delta, BIDX[0], POS[0], *ARRS)
        np.asarray(digest)  # honest: compiled, loaded, executed
    print(f"[preload] mega program ready in {time.perf_counter()-t0:.0f}s "
          f"({len(st.layout)} branches, {st.bidx.shape[0]} chunks, "
          f"{st.n_excluded} residual dispatches)", flush=True)
    if st.excluded_sigs:
        if wm:
            # warm the wm residual programs through the same dispatch path
            # mega_garble uses (there is one distinct program per excluded
            # (signature, S) — the shared _generic_group_jit_wm jit)
            from gsv_tpu.circuit.schedule import GroupStep

            seen = set()
            fnr = _generic_group_jit_wm(ex.batch)
            for gi, g in enumerate(ex.plan.steps):
                if not isinstance(g, GroupStep):
                    continue
                k = (tape_signature(g.tape), g.header_maps.shape[0])
                if k not in st.excluded_sigs or k in seen:
                    continue
                seen.add(k)
                segs, oo, meta = ex._seg_dev(g.tape)
                hm, om, fb, ghi, glo, ct_loc, token, gid = _wm_group_dev(
                    ex, g, gi)
                arena, digest = fnr(arena, token, hm, om, oo, fb, delta,
                                    ghi, glo, ct_loc, digest, gid, segs)
                if len(seen) % 8 == 0:
                    np.asarray(digest)
                    print(f"[preload] {len(seen)} wm residual programs "
                          f"({time.perf_counter()-t0:.0f}s)", flush=True)
            np.asarray(digest)
        else:
            ex.preload_programs(modes=modes, only=frozenset(st.excluded_sigs))
    return time.perf_counter() - t0


def mega_garble(ex, input_label0s, delta, false_label0, true_label0,
                top_k: int = 40, chunk: int = 256,
                checkpoint_gates: int = 0, checkpoint_fn=None):
    """Committed cts-free garble of ``ex.plan`` via mega dispatch.

    Returns (output_label0s, arena, digest) — bit-identical to
    ``ex.garble(..., ct_handler=None, commit=True)``.
    """
    plan = ex.plan
    st, dev, fn = _mega_stage_dev(ex, top_k, chunk)
    ARRS, BIDX, POS = dev

    batched = ex.batch
    wm = ex.hasher == "aes_wm"
    nb = batched or 1
    arena = ex._build_arena(false_label0, true_label0, input_label0s)
    delta = ex._shard(np.asarray(delta, dtype=np.uint32))
    if wm:
        # word-major: (B, A, 4) -> (4B, A) [row j*B+b = word j of inst b],
        # one device transpose per pass
        if not batched:
            arena = arena[None]
            delta = delta[None]
        arena = jnp.transpose(arena, (2, 0, 1)).reshape(4 * nb, -1)
        delta = jnp.transpose(delta, (1, 0)).reshape(4 * nb)
        digest = jnp.zeros((4 * nb,), np.uint32)
        fnr = _generic_group_jit_wm(batched)
    else:
        digest = ex._shard(
            np.zeros((batched, 4) if batched else (4,), np.uint32))
    prog = ex._progress("garbled")
    max_q = int(os.environ.get("GSV_MAX_QUEUE", "256"))
    since = 0
    gates_done = 0
    n_exec = 0  # remote executions this pass (the r4 wall was ~45k of them)
    next_ckpt = checkpoint_gates or None
    for kind, idx in st.schedule:
        n_exec += 1
        if kind == "mega":
            arena, digest = fn(arena, digest, delta, BIDX[idx], POS[idx],
                               *ARRS)
            prog.advance(int(st.chunk_gates[idx]))
            gates_done += int(st.chunk_gates[idx])
            # one mega call is ONE queued remote execution — counting it as
            # `chunk` made the throttle sync after every dispatch, defeating
            # the pipelining this path exists for (advisor r4).  Workspace
            # pinned per queued mega execution is bounded by the 250M-gate
            # checkpoint syncs (~every 4 chunks at B=32).
            since += 1
        else:
            g = plan.steps[idx]
            if isinstance(g, GroupStep):
                if wm:
                    segs, oo, meta = ex._seg_dev(g.tape)
                    hm, om, fb, ghi, glo, ct_loc, token, gid = _wm_group_dev(
                        ex, g, idx)
                    arena, digest = fnr(arena, token, hm, om, oo, fb, delta,
                                        ghi, glo, ct_loc, digest, gid, segs)
                else:
                    f2, oo, meta, tail = ex._dispatch(
                        "garble", True, False, g.tape, g.header_maps.shape[0])
                    hm, om, fb, ghi, glo, ct_loc, token, gid = ex._group_dev(
                        g, idx)
                    arena, digest = f2(arena, token, hm, om, oo, fb, delta,
                                       ghi, glo, ct_loc, digest, gid, *tail)
                prog.advance(g.tape.total_gates * g.n_real)
                gates_done += g.tape.total_gates * g.n_real
            else:
                src, dst = ex._copy_dev(g)
                if wm:
                    arena = _wm_copy()(arena, src, dst)
                else:
                    arena = ex._copy_fn("execute")(arena, src, dst)
            since += 1
        if since >= max_q:
            np.asarray(digest)
            since = 0
        if next_ckpt is not None and gates_done >= next_ckpt:
            np.asarray(digest)
            if checkpoint_fn is not None:
                checkpoint_fn(gates_done)
            next_ckpt += checkpoint_gates
    import sys

    print(f"[mega] pass complete: {n_exec} remote executions "
          f"({st.bidx.shape[0]} mega chunks, {st.n_excluded} residual)",
          file=sys.stderr, flush=True)
    if wm:
        oabs = jnp.asarray(plan.output_abs)
        n_out = len(plan.output_abs)
        out = np.asarray(jnp.transpose(
            arena[:, oabs].reshape(4, nb, n_out), (1, 2, 0)))
        dig = np.asarray(jnp.transpose(digest.reshape(4, nb), (1, 0)))
        if not batched:
            out, dig = out[0], dig[0]
        return out, arena, dig
    out = np.asarray(arena[..., plan.output_abs, :])
    return out, arena, np.asarray(digest)
