"""Mega-dispatch (circuit/mega.py) vs the sequential GroupExecutor: the
scan-over-switch program must reproduce labels and the chained digest
bit-exactly, including copy steps, chunk padding no-ops, and the
excluded-signature fallback path."""

import sys

import numpy as np
import pytest

sys.path.insert(0, ".")

from gsv_tpu.circuit import trace_circuit
from gsv_tpu.circuit.link import link
from gsv_tpu.circuit.mega import build_mega, mega_garble
from gsv_tpu.circuit.runtime import GroupExecutor
from gsv_tpu.circuit.schedule import schedule_plan
from gsv_tpu.circuit.tape import Compiler
from gsv_tpu.core.labels import words_from_int, words_from_int_array
from gsv_tpu.core.rng import GarblerRng
from gsv_tpu.gadgets import bigint
from gsv_tpu.gadgets.bigint import BigIntWires

W = 8
N_IN = 4 * W


def _circ(ctx, ins):
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
def gplan():
    tmpl, _ = trace_circuit(_circ, N_IN)
    plan = link(Compiler(flatten_max=200).compile(tmpl), N_IN)
    return schedule_plan(plan)


def _args(batch):
    if batch:
        rngs = [GarblerRng(1 + i) for i in range(batch)]
        in_l0 = np.stack(
            [words_from_int_array([r.issue_label0() for r in rngs])
             for _ in range(N_IN)], axis=1)
        return (in_l0,
                words_from_int_array([r.delta for r in rngs]),
                words_from_int_array([r.false_label0 for r in rngs]),
                words_from_int_array([r.true_label0 for r in rngs]))
    rng = GarblerRng(5)
    in_l0 = words_from_int_array([rng.issue_label0() for _ in range(N_IN)])
    return (in_l0, words_from_int(rng.delta),
            words_from_int(rng.false_label0), words_from_int(rng.true_label0))


@pytest.mark.parametrize("batch", [None, 3])
@pytest.mark.parametrize("top_k,chunk", [(40, 8), (2, 4)])
def test_mega_matches_sequential(gplan, batch, top_k, chunk):
    args = _args(batch)
    want, _, want_dig = GroupExecutor(gplan, batch=batch).garble(
        *args, ct_handler=None, commit=True)
    ex = GroupExecutor(gplan, batch=batch)
    st = build_mega(gplan, top_k=top_k, chunk=chunk)
    if top_k == 2:
        assert st.n_excluded > 0, "want the fallback path exercised"
    got, _, got_dig = mega_garble(ex, *args, top_k=top_k, chunk=chunk)
    assert (np.asarray(want) == np.asarray(got)).all()
    assert (np.asarray(want_dig) == np.asarray(got_dig)).all()


def test_mega_over_instances_mesh(gplan):
    """mega x mesh composition: the instance batch sharded over an
    `instances` mesh must garble to the same digest as single-device mega
    (and as the sequential executor) — the cut-and-choose DP axis under the
    superblock dispatch (VERDICT r4 #7)."""
    import jax

    from gsv_tpu.parallel.sharding import instance_mesh

    n_dev = min(4, len(jax.devices()))
    B = 2 * n_dev
    args = _args(B)
    want, _, want_dig = GroupExecutor(gplan, batch=B).garble(
        *args, ct_handler=None, commit=True)
    mesh = instance_mesh(n_dev)
    ex = GroupExecutor(gplan, batch=B, mesh=mesh)
    got, _, got_dig = mega_garble(ex, *args, top_k=40, chunk=8)
    assert (np.asarray(want) == np.asarray(got)).all()
    assert (np.asarray(want_dig) == np.asarray(got_dig)).all()


def test_mega_staging_covers_plan(gplan):
    st = build_mega(gplan, top_k=40, chunk=8)
    n_steps = len(gplan.steps)
    assert st.n_branch_steps + st.n_excluded == n_steps
    # padded scan rows only contain valid branch ids
    assert st.bidx.min() >= 0
    assert int(st.chunk_gates.sum()) <= gplan.total_gates
