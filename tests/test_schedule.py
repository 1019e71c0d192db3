"""Grouped execution (schedule.py + GroupExecutor) vs the sequential
PlanExecutor: identical outputs, bit-identical ciphertext streams, identical
evaluation — the grouped path only reorders independent steps and renames
slots, so everything observable must match exactly."""

import sys

import numpy as np
import pytest

sys.path.insert(0, ".")

from gsv_tpu.circuit import trace_circuit
from gsv_tpu.circuit.link import link
from gsv_tpu.circuit.runtime import GroupExecutor, PlanExecutor
from gsv_tpu.circuit.schedule import GroupStep, scatter_group_cts, schedule_plan
from gsv_tpu.circuit.tape import Compiler
from gsv_tpu.core.labels import (
    int_array_from_words,
    words_from_int,
    words_from_int_array,
)
from gsv_tpu.core.rng import GarblerRng
from gsv_tpu.gadgets import bigint
from gsv_tpu.gadgets.bigint import BigIntWires

W = 8  # bigint width
N_IN = 4 * W


def _circ(ctx, ins):
    """Four independent adds (groupable) feeding a dependent combine."""
    a = BigIntWires(ins[0:W])
    b = BigIntWires(ins[W : 2 * W])
    c = BigIntWires(ins[2 * W : 3 * W])
    d = BigIntWires(ins[3 * W : 4 * W])
    ab = bigint.add_without_carry(ctx, a, b)
    cd = bigint.add_without_carry(ctx, c, d)
    ac = bigint.add_without_carry(ctx, a, c)
    bd = bigint.add_without_carry(ctx, b, d)
    x = bigint.add_without_carry(ctx, ab, cd)
    y = bigint.add_without_carry(ctx, ac, bd)
    m = bigint.mul(ctx, x, y)
    return m.bits


@pytest.fixture(scope="module")
def plans():
    tmpl, _ = trace_circuit(_circ, N_IN)
    plan = link(Compiler(flatten_max=200).compile(tmpl), N_IN)
    gplan = schedule_plan(plan)
    return plan, gplan


def _rand_bits(rng):
    return rng.integers(0, 2, size=N_IN).astype(np.uint8)


def test_structure(plans):
    plan, gplan = plans
    groups = [g for g in gplan.steps if isinstance(g, GroupStep)]
    assert any(g.n_real >= 2 for g in groups), "no grouping happened"
    assert gplan.n_dispatches < len(plan.steps)
    assert gplan.total_gates == plan.total_gates
    assert gplan.ct_count == plan.ct_count


def test_ct_budget_caps_group_size(plans):
    plan, _ = plans
    tapes = [s for s in plan.steps if hasattr(s, "tape") and s.tape.ct_count]
    min_ct = min(s.tape.ct_count for s in tapes)
    budget = 4 * min_ct  # forces S*ct_count <= budget even after padding
    gplan = schedule_plan(plan, ct_budget_rows=budget)
    for g in gplan.steps:
        if isinstance(g, GroupStep) and g.tape.ct_count:
            assert g.header_maps.shape[0] * g.tape.ct_count <= budget
    # capped plan still garbles to the identical stream
    out_seq, out_grp, stream_seq, stream_grp, *_ = _garble_both(plan, gplan)
    assert (out_seq == out_grp).all()
    assert (stream_seq == stream_grp).all()


@pytest.mark.parametrize("batch", [None, 3])
def test_execute_matches(plans, batch):
    plan, gplan = plans
    rng = np.random.default_rng(7)
    bits = _rand_bits(rng) if batch is None else np.stack([_rand_bits(rng) for _ in range(batch)])
    want = PlanExecutor(plan, batch=batch).execute(bits)
    got = GroupExecutor(gplan, batch=batch).execute(bits)
    assert (np.asarray(want) == np.asarray(got)).all()


def _garble_both(plan, gplan, seed=5, commit=False):
    rng = GarblerRng(seed)
    in_l0 = [rng.issue_label0() for _ in range(N_IN)]
    args = (
        words_from_int_array(in_l0),
        words_from_int(rng.delta),
        words_from_int(rng.false_label0),
        words_from_int(rng.true_label0),
    )
    seq_cts = []
    out_seq, _ = PlanExecutor(plan).garble(*args, ct_handler=lambda c: seq_cts.append(np.asarray(c)))
    stream_seq = np.concatenate(seq_cts) if seq_cts else np.zeros((0, 4), np.uint32)

    stream_grp = np.zeros_like(stream_seq)
    gex = GroupExecutor(gplan)

    def handler(g, cts, meta):
        scatter_group_cts(g, np.asarray(cts), meta["ctb"], stream_grp)

    out_grp, _, digest = gex.garble(*args, ct_handler=handler, commit=commit)
    return out_seq, out_grp, stream_seq, stream_grp, digest, rng, in_l0


def test_garble_matches(plans):
    plan, gplan = plans
    out_seq, out_grp, stream_seq, stream_grp, digest, _, _ = _garble_both(plan, gplan)
    assert (out_seq == out_grp).all()
    assert (stream_seq == stream_grp).all()
    assert digest is None


def test_garble_commit_digest(plans):
    plan, gplan = plans
    *_, d1, _, _ = _garble_both(plan, gplan, seed=5, commit=True)
    *_, d2, _, _ = _garble_both(plan, gplan, seed=5, commit=True)
    *_, d3, _, _ = _garble_both(plan, gplan, seed=6, commit=True)
    assert d1 is not None and (d1 == d2).all()
    assert (d1 != d3).any()


def test_seg_v2_streams_identical(plans, monkeypatch):
    """GSV_SEG_V2 segmentation (fine width classes + cost-based merging)
    changes only padding shapes: the garble stream must stay bit-identical
    to the v1 plan's."""
    from gsv_tpu.circuit import tape as tape_mod

    plan_v1, _ = plans
    *_, stream_v1, _, _, _, _ = _garble_both(plan_v1, schedule_plan(plan_v1))

    monkeypatch.setattr(tape_mod, "SEG_V2", True)
    tmpl, _ = trace_circuit(_circ, N_IN)
    plan_v2 = link(Compiler(flatten_max=200).compile(tmpl), N_IN)
    gplan_v2 = schedule_plan(plan_v2)
    out_seq, out_grp, s_seq, s_grp, *_ = _garble_both(plan_v2, gplan_v2)
    assert (out_seq == out_grp).all()
    assert (s_seq == s_grp).all()
    assert (np.asarray(s_seq) == np.asarray(stream_v1)).all()
    # v2 must not pad more than v1
    def lanes(p):
        from gsv_tpu.circuit.link import TapeStep

        tot = 0
        for st in p.steps:
            if isinstance(st, TapeStep):
                tot += sum(
                    s.n_waves * (s.cf + s.cn) for s in st.tape.segments
                )
        return tot

    assert lanes(plan_v2) <= lanes(plan_v1)


def test_seg_v3_streams_identical(plans, monkeypatch):
    """GSV_SEG_V3 segmentation + exact-site chunking (the headline bench
    config) changes only padding/chunk shapes: the garble stream must stay
    bit-identical to the v1 plan's.  Covers tape._classes_v3 width classes
    and schedule._chunk_sizes/_site_cost_blocks (advisor r4: zero hermetic
    coverage on the auto-selected headline path)."""
    from gsv_tpu.circuit import schedule as sched_mod
    from gsv_tpu.circuit import tape as tape_mod

    plan_v1, _ = plans
    *_, stream_v1, _, _, _, _ = _garble_both(plan_v1, schedule_plan(plan_v1))

    monkeypatch.setattr(tape_mod, "SEG_V2", True)
    monkeypatch.setattr(tape_mod, "SEG_V3", True)
    monkeypatch.setattr(sched_mod, "_EXACT_SITES", True)
    tmpl, _ = trace_circuit(_circ, N_IN)
    plan_v3 = link(Compiler(flatten_max=200).compile(tmpl), N_IN)
    gplan_v3 = schedule_plan(plan_v3)
    out_seq, out_grp, s_seq, s_grp, *_ = _garble_both(plan_v3, gplan_v3)
    assert (out_seq == out_grp).all()
    assert (s_seq == s_grp).all()
    assert (np.asarray(s_seq) == np.asarray(stream_v1)).all()


def test_chunk_sizes_conserve_sites(plans, monkeypatch):
    """Exact-site chunking must decompose any (n, cap) into chunks that sum
    to n, each landing on (or below) a grid bucket <= cap."""
    from gsv_tpu.circuit import schedule as sched_mod
    from gsv_tpu.circuit.link import TapeStep

    plan, _ = plans
    tape0 = next(s.tape for s in plan.steps if isinstance(s, TapeStep))
    monkeypatch.setattr(sched_mod, "_EXACT_SITES", True)
    grid = sched_mod._S_GRID
    for n in (1, 2, 3, 7, 15, 16, 17, 100, 1000, 4095, 4096, 4097, 65537):
        for cap in (16, 64, 1024):
            sizes = sched_mod._chunk_sizes(n, cap, grid, tape0, {})
            assert sum(sizes) == n, (n, cap, sizes)
            assert all(0 < s <= cap for s in sizes), (n, cap, sizes)


@pytest.mark.parametrize("batch", [None, 2])
def test_garble_evaluate_2pc(plans, batch):
    """Group-locked 2PC roundtrip: device-consumed ciphertexts, matching
    garbler/evaluator stream digests, values == plaintext execution, and
    active label == label0 ^ value*delta on every output wire."""
    plan, gplan = plans
    B = batch or 1
    rngs = [GarblerRng(5 + i) for i in range(B)]
    bit_rng = np.random.default_rng(11)

    def stack(x):
        a = np.stack(x) if batch else np.asarray(x[0])
        return a

    in_l0 = [[r.issue_label0() for _ in range(N_IN)] for r in rngs]
    l0 = stack([words_from_int_array(v) for v in in_l0])
    bits = stack([_rand_bits(bit_rng) for _ in range(B)])
    delta = stack([words_from_int(r.delta) for r in rngs])
    f0 = stack([words_from_int(r.false_label0) for r in rngs])
    t0 = stack([words_from_int(r.true_label0) for r in rngs])

    res = GroupExecutor(gplan, batch=batch).garble_evaluate_2pc(
        l0, bits, delta, f0, t0
    )
    assert (res["garble_digest"] == res["evaluate_digest"]).all()
    want = np.asarray(GroupExecutor(gplan, batch=batch).execute(bits))
    assert (res["out_bits"] == want).all()
    lab = int_array_from_words(res["out_active"].reshape(-1, 4))
    w0 = int_array_from_words(res["out_label0"].reshape(-1, 4))
    vals = res["out_bits"].reshape(-1).tolist()
    deltas = np.repeat([r.delta for r in rngs], len(vals) // B).tolist()
    for la, lw, v, dl in zip(lab, w0, vals, deltas):
        assert la == (lw ^ (dl if v else 0))


def test_lane_chunking_matches(plans, monkeypatch):
    """A tiny lane budget forces the chunked (inner fori_loop) wave path in
    garble AND evaluate; streams, digests, labels and values must be
    bit-identical to the sequential executor (chunking only splits a wave's
    independent lanes)."""
    from gsv_tpu.circuit import runtime as rt

    plan, gplan = plans
    assert any(
        sv["n_a"].shape[1] > 8
        for g in gplan.steps
        if isinstance(g, GroupStep)
        for sv in rt.padded_seg_args_group(g.tape)[0]
    ), "fixture has no wave wide enough to chunk"
    monkeypatch.setattr(rt, "_LANE_BUDGET", 8)
    rt._GROUP_JITS.clear()
    try:
        out_seq, out_grp, stream_seq, stream_grp, digest, rng0, in_l0 = (
            _garble_both(plan, gplan, commit=True)
        )
        assert (out_seq == out_grp).all()
        assert (stream_seq == stream_grp).all()

        delta = rng0.delta
        g5 = GarblerRng(5)
        bits = np.random.default_rng(3).integers(0, 2, size=N_IN).astype(np.uint8)
        inl = [l ^ (delta if b else 0) for l, b in zip(in_l0, bits)]
        eval_args = (
            words_from_int_array(inl),
            bits,
            words_from_int(g5.false_label0),
            words_from_int(g5.true_label0 ^ delta),
        )
        lab_seq, val_seq = PlanExecutor(plan).evaluate(
            *eval_args, ct_source=lambda base, cnt: stream_seq[base : base + cnt]
        )

        def gsource(g, meta):
            ctb = meta["ctb"]
            S = g.header_maps.shape[0]
            buf = np.zeros((S * ctb + 1, 4), np.uint32)
            ct = g.tape.ct_count
            for s in range(g.n_real):
                base = int(g.ct_bases[s])
                buf[s * ctb : s * ctb + ct] = stream_seq[base : base + ct]
            return buf

        lab_grp, val_grp, eval_digest = GroupExecutor(gplan).evaluate(
            *eval_args, ct_source=gsource, commit=True
        )
        assert (np.asarray(val_seq) == np.asarray(val_grp)).all()
        assert (np.asarray(lab_seq) == np.asarray(lab_grp)).all()
        assert (np.asarray(eval_digest) == np.asarray(digest)).all()
    finally:
        rt._GROUP_JITS.clear()


def test_fat_tape_siteloop_matches(plans, monkeypatch):
    """Fat-tape site serialization (GSV_SITELOOP_CT): forcing the threshold
    to 0 makes every S>1 group with ciphertexts run its sites through the
    outer fori_loop; labels, streams and digests must stay bit-identical to
    the sequential executor (the loop body IS the S=1 program at the same
    original ct/gate-id positions)."""
    from gsv_tpu.circuit import runtime as rt

    plan, gplan = plans
    assert any(
        isinstance(g, GroupStep)
        and g.header_maps.shape[0] > 1
        and g.tape.ct_count > 0
        for g in gplan.steps
    ), "fixture has no multi-site group with ciphertexts"
    monkeypatch.setattr(rt, "_SITELOOP_CT_ROWS", 0)
    rt._GROUP_JITS.clear()
    try:
        out_seq, out_grp, stream_seq, stream_grp, digest, rng0, in_l0 = (
            _garble_both(plan, gplan, commit=True)
        )
        assert (out_seq == out_grp).all()
        assert (stream_seq == stream_grp).all()

        delta = rng0.delta
        g5 = GarblerRng(5)
        bits = np.random.default_rng(3).integers(0, 2, size=N_IN).astype(np.uint8)
        inl = [l ^ (delta if b else 0) for l, b in zip(in_l0, bits)]
        eval_args = (
            words_from_int_array(inl),
            bits,
            words_from_int(g5.false_label0),
            words_from_int(g5.true_label0 ^ delta),
        )
        lab_seq, val_seq = PlanExecutor(plan).evaluate(
            *eval_args, ct_source=lambda base, cnt: stream_seq[base : base + cnt]
        )

        def gsource(g, meta):
            ctb = meta["ctb"]
            S = g.header_maps.shape[0]
            buf = np.zeros((S * ctb + 1, 4), np.uint32)
            ct = g.tape.ct_count
            for s in range(g.n_real):
                base = int(g.ct_bases[s])
                buf[s * ctb : s * ctb + ct] = stream_seq[base : base + ct]
            return buf

        lab_grp, val_grp, eval_digest = GroupExecutor(gplan).evaluate(
            *eval_args, ct_source=gsource, commit=True
        )
        assert (np.asarray(val_seq) == np.asarray(val_grp)).all()
        assert (np.asarray(lab_seq) == np.asarray(lab_grp)).all()
        assert (np.asarray(eval_digest) == np.asarray(digest)).all()
    finally:
        rt._GROUP_JITS.clear()


def test_packed_segs_matches(plans, monkeypatch):
    """GSV_PACKED_SEGS dispatch path (two pooled seg buffers + static
    layout, runtime.pack_seg_args): garble stream/labels/digest and the
    evaluate roundtrip must be bit-identical to the plain segs pytree."""
    from gsv_tpu.circuit import runtime as rt

    plan, gplan = plans
    out_seq, out_grp, stream_seq, stream_grp, digest, rng0, in_l0 = (
        _garble_both(plan, gplan, commit=True)
    )
    monkeypatch.setenv("GSV_PACKED_SEGS", "1")
    try:
        gex = GroupExecutor(gplan)
        assert gex.packed
        stream_p = np.zeros_like(stream_seq)

        def handler(g, cts, meta):
            scatter_group_cts(g, np.asarray(cts), meta["ctb"], stream_p)

        rng = GarblerRng(5)
        in_l0p = [rng.issue_label0() for _ in range(N_IN)]
        args = (
            words_from_int_array(in_l0p),
            words_from_int(rng.delta),
            words_from_int(rng.false_label0),
            words_from_int(rng.true_label0),
        )
        out_p, _, dig_p = gex.garble(*args, ct_handler=handler, commit=True)
        assert (np.asarray(out_p) == np.asarray(out_grp)).all()
        assert (stream_p == stream_seq).all()
        assert (np.asarray(dig_p) == np.asarray(digest)).all()

        bits = np.random.default_rng(3).integers(0, 2, size=N_IN).astype(np.uint8)
        delta = rng.delta
        inl = [l ^ (delta if b else 0) for l, b in zip(in_l0p, bits)]

        def gsource(g, meta):
            ctb = meta["ctb"]
            S = g.header_maps.shape[0]
            buf = np.zeros((S * ctb + 1, 4), np.uint32)
            ct = g.tape.ct_count
            for s in range(g.n_real):
                base = int(g.ct_bases[s])
                buf[s * ctb : s * ctb + ct] = stream_p[base : base + ct]
            return buf

        lab, val, edig = GroupExecutor(gplan).evaluate(
            words_from_int_array(inl), bits,
            words_from_int(rng.false_label0),
            words_from_int(rng.true_label0 ^ delta),
            ct_source=gsource, commit=True,
        )
        lab_seq, val_seq = PlanExecutor(plan).evaluate(
            words_from_int_array(inl), bits,
            words_from_int(rng.false_label0),
            words_from_int(rng.true_label0 ^ delta),
            ct_source=lambda base, cnt: stream_seq[base : base + cnt],
        )
        assert (np.asarray(val) == np.asarray(val_seq)).all()
        assert (np.asarray(lab) == np.asarray(lab_seq)).all()
        assert (np.asarray(edig) == np.asarray(digest)).all()
    finally:
        rt._GROUP_JITS.clear()


def test_blake3_group_matches_sequential(plans):
    """The grouped executor under hasher=blake3 streams bit-identically to
    the sequential executor (the --hasher blake3 protocol path)."""
    plan, gplan = plans
    rng = GarblerRng(5)
    in_l0 = [rng.issue_label0() for _ in range(N_IN)]
    args = (
        words_from_int_array(in_l0),
        words_from_int(rng.delta),
        words_from_int(rng.false_label0),
        words_from_int(rng.true_label0),
    )
    seq_cts = []
    out_seq, _ = PlanExecutor(plan, hasher="blake3").garble(
        *args, ct_handler=lambda c: seq_cts.append(np.asarray(c))
    )
    stream_seq = np.concatenate(seq_cts)
    stream_grp = np.zeros_like(stream_seq)

    def handler(g, cts, meta):
        scatter_group_cts(g, np.asarray(cts), meta["ctb"], stream_grp)

    out_grp, _, _ = GroupExecutor(gplan, hasher="blake3").garble(
        *args, ct_handler=handler
    )
    assert (np.asarray(out_seq) == np.asarray(out_grp)).all()
    assert (stream_seq == stream_grp).all()


def test_nocts_variant_digest_matches(plans):
    """Handler-less committed garbling uses the cts-free (deep-pipeline)
    program variant; its digest and output labels must match the
    cts-emitting path exactly."""
    plan, gplan = plans
    out_ref, _, _, _, d_ref, _, _ = _garble_both(plan, gplan, seed=5, commit=True)
    rng = GarblerRng(5)
    in_l0 = [rng.issue_label0() for _ in range(N_IN)]
    out, _, d2 = GroupExecutor(gplan).garble(
        words_from_int_array(in_l0),
        words_from_int(rng.delta),
        words_from_int(rng.false_label0),
        words_from_int(rng.true_label0),
        ct_handler=None,
        commit=True,
    )
    assert (np.asarray(d2) == np.asarray(d_ref)).all()
    assert (np.asarray(out) == np.asarray(out_ref)).all()


def test_evaluate_matches(plans):
    plan, gplan = plans
    out_seq, out_grp, stream, _, garble_digest, rng0, in_l0 = _garble_both(
        plan, gplan, commit=True
    )
    delta = rng0.delta
    g5 = GarblerRng(5)
    bits = np.random.default_rng(3).integers(0, 2, size=N_IN).astype(np.uint8)
    inl = [l ^ (delta if b else 0) for l, b in zip(in_l0, bits)]
    eval_args = (
        words_from_int_array(inl),
        bits,
        words_from_int(g5.false_label0),
        words_from_int(g5.true_label0 ^ delta),
    )
    lab_seq, val_seq = PlanExecutor(plan).evaluate(
        *eval_args, ct_source=lambda base, cnt: stream[base : base + cnt]
    )

    def gsource(g, meta):
        ctb = meta["ctb"]
        S = g.header_maps.shape[0]
        buf = np.zeros((S * ctb + 1, 4), np.uint32)
        ct = g.tape.ct_count
        for s in range(g.n_real):
            base = int(g.ct_bases[s])
            buf[s * ctb : s * ctb + ct] = stream[base : base + ct]
        return buf

    lab_grp, val_grp, eval_digest = GroupExecutor(gplan).evaluate(
        *eval_args, ct_source=gsource, commit=True
    )
    assert (np.asarray(val_seq) == np.asarray(val_grp)).all()
    assert (np.asarray(lab_seq) == np.asarray(lab_grp)).all()
    # the evaluator's digest of the stream it consumed matches the
    # garbler's commitment digest (the 2PC/C&C stream-hash check)
    assert (np.asarray(eval_digest) == np.asarray(garble_digest)).all()
    # 2PC invariant: active output label == label0 ^ value*delta
    for lab, w0, v in zip(
        int_array_from_words(lab_grp),
        int_array_from_words(out_seq),
        np.asarray(val_grp).tolist(),
    ):
        assert lab == (w0 ^ (delta if v else 0))


def test_batched_pallas_group_matches_aes(plans, monkeypatch):
    """hasher='aes_pallas' on a BATCHED GroupExecutor: the custom_vmap rule
    collapses the instance batch into the AES block axis (one wide kernel
    per wave instead of B tile-padded ones) — every digest and output label
    must stay bit-identical to the XLA 'aes' path."""
    from gsv_tpu.circuit import runtime as rt

    monkeypatch.setattr(rt, "_PALLAS_MIN_BLOCKS", 1)
    _, gplan = plans
    B = 3
    rngs = [GarblerRng(50 + i) for i in range(B)]
    in_l0 = np.stack(
        [words_from_int_array([r.issue_label0() for r in rngs])
         for _ in range(N_IN)], axis=1)
    delta = words_from_int_array([r.delta for r in rngs])
    f0 = words_from_int_array([r.false_label0 for r in rngs])
    t0 = words_from_int_array([r.true_label0 for r in rngs])
    outs = {}
    for hasher in ("aes", "aes_pallas", "aes_pallas2"):
        out, _, dig = GroupExecutor(gplan, batch=B, hasher=hasher).garble(
            in_l0, delta, f0, t0, ct_handler=None, commit=True)
        outs[hasher] = (np.asarray(out), np.asarray(dig))
    for hasher in ("aes_pallas", "aes_pallas2"):
        assert (outs["aes"][0] == outs[hasher][0]).all()
        assert (outs["aes"][1] == outs[hasher][1]).all()


def test_preload_constants_matches_lazy(plans):
    """preload_constants (threaded up-front upload of all per-pass device
    constants — the r4 warm-pass fix) must leave the executor in exactly
    the state the lazy per-dispatch path builds: same outputs, same
    digest, and no re-uploads (the _dev cache is fully populated)."""
    plan, gplan = plans
    rng = GarblerRng(5)
    in_l0 = [rng.issue_label0() for _ in range(N_IN)]
    args = (
        words_from_int_array(in_l0),
        words_from_int(rng.delta),
        words_from_int(rng.false_label0),
        words_from_int(rng.true_label0),
    )
    lazy = GroupExecutor(gplan)
    out_lazy, _, d_lazy = lazy.garble(*args, ct_handler=None, commit=True)

    pre = GroupExecutor(gplan)
    pre.preload_constants(threads=2)
    n_keys = len(pre._dev)
    ckpts = []
    out_pre, _, d_pre = pre.garble(
        *args, ct_handler=None, commit=True,
        checkpoint_gates=1, checkpoint_fn=ckpts.append)
    assert (np.asarray(out_lazy) == np.asarray(out_pre)).all()
    assert (np.asarray(d_lazy) == np.asarray(d_pre)).all()
    # the pass added only jit-function cache entries, no new device consts
    new = [k for k in pre._dev if k not in ("copy",)]
    assert len([k for k in new if isinstance(k, tuple)]) >= n_keys - 1
    assert ckpts and ckpts[-1] == gplan.total_gates


def test_preload_constants_batched_packed(plans, monkeypatch):
    """Packed-segs + batched variant of the preload equivalence check."""
    _, gplan = plans
    monkeypatch.setenv("GSV_PACKED_SEGS", "1")
    B = 2
    rngs = [GarblerRng(50 + i) for i in range(B)]
    in_l0 = np.stack(
        [words_from_int_array([r.issue_label0() for r in rngs])
         for _ in range(N_IN)], axis=1)
    delta = words_from_int_array([r.delta for r in rngs])
    f0 = words_from_int_array([r.false_label0 for r in rngs])
    t0 = words_from_int_array([r.true_label0 for r in rngs])
    lazy = GroupExecutor(gplan, batch=B)
    out_lazy, _, d_lazy = lazy.garble(in_l0, delta, f0, t0,
                                      ct_handler=None, commit=True)
    pre = GroupExecutor(gplan, batch=B)
    pre.preload_constants(threads=2)
    out_pre, _, d_pre = pre.garble(in_l0, delta, f0, t0,
                                   ct_handler=None, commit=True)
    assert (np.asarray(out_lazy) == np.asarray(out_pre)).all()
    assert (np.asarray(d_lazy) == np.asarray(d_pre)).all()


def test_preload_programs_then_garble(plans):
    """Warm-executing every distinct program on throwaway buffers must not
    perturb a subsequent real pass (donated dummies are independent)."""
    plan, gplan = plans
    rng = GarblerRng(5)
    in_l0 = [rng.issue_label0() for _ in range(N_IN)]
    args = (
        words_from_int_array(in_l0),
        words_from_int(rng.delta),
        words_from_int(rng.false_label0),
        words_from_int(rng.true_label0),
    )
    want, _, want_dig = GroupExecutor(gplan).garble(
        *args, ct_handler=None, commit=True
    )
    gex = GroupExecutor(gplan)
    gex.preload_constants()
    dt = gex.preload_programs(
        modes=("garble_nocts", "garble", "evaluate", "execute")
    )
    assert dt >= 0
    got, _, got_dig = gex.garble(*args, ct_handler=None, commit=True)
    assert (np.asarray(want) == np.asarray(got)).all()
    assert (np.asarray(want_dig) == np.asarray(got_dig)).all()
