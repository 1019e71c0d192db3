"""Intra-instance multi-chip sharding (gsv_tpu.parallel.intra) on the
8-virtual-device CPU mesh: site-sharded garbling and the cross-chip 2PC
must be bit-identical to the single-device executors and the interpreter
oracle (SURVEY §2.7 intra-instance axis)."""

import sys

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

sys.path.insert(0, ".")

from gsv_tpu.circuit import trace_circuit
from gsv_tpu.circuit.link import link
from gsv_tpu.circuit.runtime import GroupExecutor
from gsv_tpu.circuit.schedule import GroupStep, scatter_group_cts, schedule_plan
from gsv_tpu.circuit.tape import Compiler
from gsv_tpu.circuit.interp import ExecuteInterp
from gsv_tpu.core.labels import (
    int_array_from_words,
    words_from_int,
    words_from_int_array,
)
from gsv_tpu.core.rng import GarblerRng
from gsv_tpu.gadgets import bigint
from gsv_tpu.gadgets.bigint import BigIntWires
from gsv_tpu.parallel.intra import IntraShardExecutor, cross_chip_2pc

W = 8
N_IN = 4 * W


def _circ(ctx, ins):
    """Many independent adds (wide groups) feeding a dependent tail."""
    xs = [BigIntWires(ins[k * W : (k + 1) * W]) for k in range(4)]
    sums = [
        bigint.add_without_carry(ctx, xs[i], xs[j])
        for i in range(4)
        for j in range(i + 1, 4)
    ]  # 6 parallel sites of one template
    acc = sums[0]
    for s in sums[1:]:
        acc = bigint.add_without_carry(ctx, acc, s)
    m = bigint.mul(ctx, acc, xs[0])
    return m.bits


@pytest.fixture(scope="module")
def plans():
    tmpl, _ = trace_circuit(_circ, N_IN)
    plan = link(Compiler(flatten_max=200).compile(tmpl), N_IN)
    gplan = schedule_plan(plan)
    return tmpl, plan, gplan


def _mesh(n, name):
    devs = jax.devices()
    assert len(devs) >= n, devs
    return Mesh(np.array(devs[:n]), (name,))


def _seed_args(seed=5):
    rng = GarblerRng(seed)
    in_l0 = [rng.issue_label0() for _ in range(N_IN)]
    return rng, in_l0, (
        words_from_int_array(in_l0),
        words_from_int(rng.delta),
        words_from_int(rng.false_label0),
        words_from_int(rng.true_label0),
    )


@pytest.mark.parametrize("n_dev", [2, 4])
def test_site_sharded_garble_matches(plans, n_dev):
    _, plan, gplan = plans
    assert any(
        isinstance(g, GroupStep)
        and g.header_maps.shape[0] >= n_dev
        and g.header_maps.shape[0] % n_dev == 0
        for g in gplan.steps
    ), "fixture has no shardable multi-site group"

    _, _, args = _seed_args()
    # single-device oracle
    want_stream = np.zeros((gplan.ct_count, 4), np.uint32)
    gex = GroupExecutor(gplan)

    def w_handler(g, cts, meta):
        scatter_group_cts(g, np.asarray(cts), meta["ctb"], want_stream)

    want_out, _, want_digest = gex.garble(*args, ct_handler=w_handler,
                                          commit=True)

    # site-sharded across the mesh
    mesh = _mesh(n_dev, "sites")
    got_stream = np.zeros((gplan.ct_count, 4), np.uint32)
    ex = IntraShardExecutor(gplan, mesh, axis="sites")

    def g_handler(g, body, meta):
        scatter_group_cts(g, np.asarray(body), meta["ctb"], got_stream)

    got_out, _, got_digest = ex.garble(*args, ct_handler=g_handler,
                                       commit=True)
    assert (np.asarray(want_out) == got_out).all()
    assert (want_stream == got_stream).all()
    assert (np.asarray(want_digest) == got_digest).all()


def test_cross_chip_2pc_matches(plans):
    tmpl, plan, gplan = plans
    mesh = _mesh(2, "role")
    rng, in_l0, _ = _seed_args(seed=9)
    bits = np.random.default_rng(4).integers(0, 2, size=N_IN).astype(np.uint8)
    res = cross_chip_2pc(
        gplan, mesh,
        words_from_int_array(in_l0), bits,
        words_from_int(rng.delta),
        words_from_int(rng.false_label0),
        words_from_int(rng.true_label0),
    )
    # evaluator consumed exactly the garbler's stream
    assert (res["garble_digest"] == res["evaluate_digest"]).all()
    # plaintext outputs match plain execution
    want_bits = ExecuteInterp().run(tmpl, [bool(b) for b in bits])
    assert [bool(v) for v in res["eval_values"]] == want_bits
    # active labels satisfy label0 ^ value*delta
    delta = rng.delta
    l0 = int_array_from_words(res["garble_out_label0s"])
    act = int_array_from_words(res["eval_labels"])
    for a, l, v in zip(act, l0, want_bits):
        assert a == (l ^ (delta if v else 0))
