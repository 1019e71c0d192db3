"""Multi-process (multi-host rehearsal) instance sharding.

``test_multihost_tiny`` runs IN the hermetic suite: 2 jax.distributed CPU
processes (Gloo collectives) over a small bigint circuit, asserting sharded
garbling + the commitment reduction match the single-process oracle
bit-for-bit (the fake-cluster analogue of the reference's thread/channel
tests, cut_and_choose/tests.rs:99-238).  The full fq-mul-model version
stays gated behind GSV_SLOW=1.

``test_uneven_instance_shard`` covers instances % devices != 0 on the
single-process 8-device mesh via ``pad_instances``.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, ".")

slow = pytest.mark.skipif(
    not os.environ.get("GSV_SLOW"), reason="set GSV_SLOW=1 to run"
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_example(extra, timeout):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # workers force cpu themselves
    return subprocess.run(
        [sys.executable,
         os.path.join(REPO, "examples", "multihost_cut_and_choose.py"),
         *extra],
        capture_output=True, text=True, timeout=timeout, cwd=REPO, env=env,
    )


def test_multihost_tiny():
    out = _run_example(["--tiny"], timeout=300)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "MULTIHOST OK (2 processes)" in out.stdout
    assert out.stdout.count("PARITY OK") == 2


@slow
def test_multihost_parity():
    out = _run_example([], timeout=900)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "MULTIHOST OK (2 processes)" in out.stdout
    assert out.stdout.count("PARITY OK") == 2


def test_uneven_instance_shard():
    """B=6 instances over a 4-device mesh: pad to 8, results of the 6 real
    instances bit-match the unsharded batch."""
    import jax
    from jax.sharding import Mesh

    from gsv_tpu.circuit import trace_circuit
    from gsv_tpu.circuit.link import link
    from gsv_tpu.circuit.runtime import GroupExecutor
    from gsv_tpu.circuit.schedule import schedule_plan
    from gsv_tpu.circuit.tape import Compiler
    from gsv_tpu.core.labels import words_from_int, words_from_int_array
    from gsv_tpu.core.rng import GarblerRng
    from gsv_tpu.gadgets import bigint
    from gsv_tpu.gadgets.bigint import BigIntWires
    from gsv_tpu.parallel.sharding import pad_instances

    W = 8

    def circ(ctx, ins):
        a = BigIntWires(ins[:W])
        b = BigIntWires(ins[W:])
        return bigint.mul(ctx, a, b).bits

    tmpl, _ = trace_circuit(circ, 2 * W)
    gplan = schedule_plan(link(Compiler(flatten_max=200).compile(tmpl), 2 * W))

    B, n_dev = 6, 4
    rngs = [GarblerRng(500 + i) for i in range(B)]
    in_l0 = np.stack([
        words_from_int_array([r.issue_label0() for _ in range(2 * W)])
        for r in rngs
    ])
    deltas = np.stack([words_from_int(r.delta) for r in rngs])
    f0 = np.stack([words_from_int(r.false_label0) for r in rngs])
    t0 = np.stack([words_from_int(r.true_label0) for r in rngs])

    want, _, want_dig = GroupExecutor(gplan, batch=B).garble(
        in_l0, deltas, f0, t0, ct_handler=None, commit=True)

    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("instances",))
    p_in, n_real = pad_instances(in_l0, n_dev)
    p_d, _ = pad_instances(deltas, n_dev)
    p_f, _ = pad_instances(f0, n_dev)
    p_t, _ = pad_instances(t0, n_dev)
    assert n_real == B and p_in.shape[0] == 8
    got, _, got_dig = GroupExecutor(
        gplan, batch=p_in.shape[0], mesh=mesh).garble(
        p_in, p_d, p_f, p_t, ct_handler=None, commit=True)
    assert (np.asarray(got)[:n_real] == np.asarray(want)).all()
    assert (np.asarray(got_dig)[:n_real] == np.asarray(want_dig)).all()
