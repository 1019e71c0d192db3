"""Grouped cut-and-choose (protocol/grouped_c2c.py): full flow on a small
circuit — batched create/commit, challenge, opened-instance audit, fused
finalized evaluation with device-consumed ciphertexts — plus tamper cases
(reference evaluator.rs consistency checks)."""

import random
import sys

import numpy as np
import pytest

sys.path.insert(0, ".")

from gsv_tpu.circuit import trace_circuit
from gsv_tpu.circuit.link import link
from gsv_tpu.circuit.runtime import GroupExecutor
from gsv_tpu.circuit.schedule import schedule_plan
from gsv_tpu.circuit.streaming import EvaluatedWire
from gsv_tpu.circuit.tape import Compiler
from gsv_tpu.protocol.cut_and_choose import Config, ConsistencyError
from gsv_tpu.protocol.grouped_c2c import (
    GroupedEvaluator,
    GroupedGarbler,
    GroupedRunner,
)
from gsv_tpu.gadgets import bigint
from gsv_tpu.gadgets.bigint import BigIntWires

W = 8
N_IN = 2 * W


def _circ(ctx, ins):
    a = BigIntWires(ins[0:W])
    b = BigIntWires(ins[W : 2 * W])
    return bigint.mul(ctx, a, b).bits


@pytest.fixture(scope="module")
def runner():
    tmpl, _ = trace_circuit(_circ, N_IN)
    plan = link(Compiler(flatten_max=100).compile(tmpl), N_IN)
    return GroupedRunner(schedule_plan(plan))


@pytest.fixture(scope="module")
def protocol(runner):
    cfg = Config(total=3, to_finalize=1)
    garbler = GroupedGarbler(runner, cfg, seeds=[11, 22, 33])
    garbler.create()
    commits = garbler.commit()
    ev = GroupedEvaluator(random.Random(7), cfg, commits)
    return cfg, garbler, commits, ev


def _inputs(garbler, index, bits):
    inst = garbler.instances[index]
    return [
        EvaluatedWire(gw.select(bool(b)), bool(b))
        for gw, b in zip(inst.input_labels, bits)
    ]


def test_full_flow(runner, protocol):
    cfg, garbler, commits, ev = protocol
    open_seeds = garbler.open_commit(ev.to_finalize)
    assert len(open_seeds) == cfg.total - cfg.to_finalize
    ev.check_opened(runner, open_seeds)

    idx = ev.to_finalize[0]
    inst = garbler.instances[idx]
    bits = np.random.default_rng(3).integers(0, 2, size=N_IN).astype(np.uint8)
    out = ev.evaluate_finalized(
        runner, garbler, idx, _inputs(garbler, idx, bits),
        true_label=inst.true_wire.select(True),
        false_label=inst.false_wire.select(False),
    )
    want = np.asarray(GroupExecutor(runner.gplan).execute(bits))
    assert out.value == bool(want[0])
    assert out.active_label == inst.output_label.select(out.value)


def test_tampered_stream_digest(runner, protocol):
    import copy

    cfg, garbler, commits, ev = protocol
    idx = ev.to_finalize[0]
    bad = GroupedEvaluator(random.Random(7), cfg, copy.deepcopy(commits))
    bad.commits[idx].ciphertext_commit = b"\x00" * 16
    inst = garbler.instances[idx]
    bits = np.zeros(N_IN, np.uint8)
    with pytest.raises(ConsistencyError, match="digest"):
        bad.evaluate_finalized(
            runner, garbler, idx, _inputs(garbler, idx, bits),
            true_label=inst.true_wire.select(True),
            false_label=inst.false_wire.select(False),
        )


def test_wrong_input_label(runner, protocol):
    cfg, garbler, commits, ev = protocol
    idx = ev.to_finalize[0]
    inst = garbler.instances[idx]
    wires = _inputs(garbler, idx, np.zeros(N_IN, np.uint8))
    wires[0] = EvaluatedWire(wires[0].active_label ^ 1, wires[0].value)
    with pytest.raises(ConsistencyError, match="input label"):
        ev.evaluate_finalized(
            runner, garbler, idx, wires,
            true_label=inst.true_wire.select(True),
            false_label=inst.false_wire.select(False),
        )


def test_lying_opened_seed(runner, protocol):
    cfg, garbler, commits, ev = protocol
    open_seeds = garbler.open_commit(ev.to_finalize)
    k = next(iter(open_seeds))
    open_seeds[k] ^= 1
    with pytest.raises(ConsistencyError, match="commit mismatch"):
        ev.check_opened(runner, open_seeds)


def test_sharded_create_matches_unsharded(runner):
    """Grouped garbling with the batch laid across the 8-virtual-device
    instances mesh produces identical commitments (labels + digests) to the
    single-device run — the SPMD path changes layout, never math."""
    import jax

    from gsv_tpu.parallel.sharding import instance_mesh

    n = min(8, len(jax.devices()))
    if n < 2:
        pytest.skip("needs >1 device")
    cfg = Config(total=n, to_finalize=1)
    seeds = list(range(51, 51 + n))
    mesh_runner = GroupedRunner(runner.gplan, mesh=instance_mesh(n))
    g_mesh = GroupedGarbler(mesh_runner, cfg, seeds=seeds)
    g_mesh.create()
    g_ref = GroupedGarbler(runner, cfg, seeds=seeds)
    g_ref.create()
    assert g_mesh.commit() == g_ref.commit()


def test_wrong_opened_indices(runner, protocol):
    cfg, garbler, commits, ev = protocol
    open_seeds = garbler.open_commit(ev.to_finalize)
    open_seeds[ev.to_finalize[0]] = 999  # offering the finalized one opened
    with pytest.raises(ConsistencyError, match="opened indices"):
        ev.check_opened(runner, open_seeds)


def test_all_finalized_no_opened(runner):
    """finalize == total: no seeds revealed, check_opened passes trivially,
    every instance still evaluates (the degenerate-but-legal config)."""
    cfg = Config(total=2, to_finalize=2)
    g = GroupedGarbler(runner, cfg, seeds=[7, 8])
    g.create()
    ev = GroupedEvaluator(random.Random(3), cfg, g.commit())
    assert sorted(ev.to_finalize) == [0, 1]
    open_seeds = g.open_commit(ev.to_finalize)
    assert open_seeds == {}
    ev.check_opened(runner, open_seeds)
    bits = np.zeros(N_IN, np.uint8)
    for i in ev.to_finalize:
        inst = g.instances[i]
        out = ev.evaluate_finalized(
            runner, g, i, _inputs(g, i, bits),
            true_label=inst.true_wire.select(True),
            false_label=inst.false_wire.select(False),
        )
        assert out.active_label == inst.output_label.select(out.value)


def test_single_instance_config(runner):
    """total == finalize == 1 (the smallest protocol instance)."""
    cfg = Config(total=1, to_finalize=1)
    g = GroupedGarbler(runner, cfg, seeds=[99])
    g.create()
    ev = GroupedEvaluator(random.Random(5), cfg, g.commit())
    ev.check_opened(runner, g.open_commit(ev.to_finalize))
    inst = g.instances[0]
    bits = np.ones(N_IN, np.uint8)
    out = ev.evaluate_finalized(
        runner, g, 0, _inputs(g, 0, bits),
        true_label=inst.true_wire.select(True),
        false_label=inst.false_wire.select(False),
    )
    want = np.asarray(GroupExecutor(runner.gplan).execute(bits))
    assert out.value == bool(want[0])


def test_batch_bucket_and_shared_arena_match_plain(runner):
    """batch_bucket padding + an oversized shared arena are pure compile-
    economics knobs: every protocol byte (commits, digests, outputs) must
    be identical to the unbucketed flow at the plan's native arena size."""
    cfg = Config(total=3, to_finalize=1)
    plain_g = GroupedGarbler(runner, cfg, seeds=[11, 22, 33])
    plain_g.create()

    bucketed = GroupedRunner(
        runner.gplan,
        batch_bucket=5,
        arena_size=runner.gplan.arena_size + 1234,
    )
    g = GroupedGarbler(bucketed, cfg, seeds=[11, 22, 33])
    g.create()
    commits = g.commit()
    assert commits == plain_g.commit()

    ev = GroupedEvaluator(random.Random(7), cfg, commits)
    ev.check_opened(bucketed, g.open_commit(ev.to_finalize))

    idx = ev.to_finalize[0]
    inst = g.instances[idx]
    bits = np.random.default_rng(3).integers(0, 2, size=N_IN).astype(np.uint8)
    out = ev.evaluate_finalized(
        bucketed, g, idx, _inputs(g, idx, bits),
        true_label=inst.true_wire.select(True),
        false_label=inst.false_wire.select(False),
    )
    want = np.asarray(GroupExecutor(runner.gplan).execute(bits))
    assert out.value == bool(want[0])
    assert out.active_label == inst.output_label.select(out.value)
