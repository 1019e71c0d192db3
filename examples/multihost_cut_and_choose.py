"""Multi-HOST cut-and-choose rehearsal: instances sharded across processes.

The reference scales cut-and-choose to many machines by running independent
OS processes per instance pool (cut_and_choose/mod.rs rayon pool x N hosts,
spooling ciphertexts to files).  The TPU-native layout keeps the same SPMD
story as the single-host mesh (examples/multichip_cut_and_choose.py) but
lets the ``instances`` axis span a multi-process `jax.distributed` cluster:
each host garbles its local shard of instances with the replicated plan,
and the stream commitment reduction rides a cross-host collective (DCN in
a real pod; Gloo here).

This script is the CPU rehearsal mandated for single-chip environments:
it spawns ``n_proc`` local worker processes, each owning
``local_devices`` virtual CPU devices, builds the global 1-D ``instances``
mesh over all of them, garbles a batch of fq-mul instances SPMD, and
asserts on every process that

  * per-instance output labels gathered across hosts match a
    single-process unsharded garble of the same seeds bit-for-bit, and
  * the psum-aggregated ciphertext checksum (the commitment reduction)
    matches the host-computed one.

Usage:
    python examples/multihost_cut_and_choose.py              # 2 procs x 4 dev
    python examples/multihost_cut_and_choose.py 2 4 --check  # same, explicit
    python examples/multihost_cut_and_choose.py --tiny       # <60s hermetic
(the launcher re-execs itself with --worker; workers print PARITY OK.
``--tiny`` swaps the fq-mul model for a small bigint circuit so the
rehearsal runs inside the hermetic test suite's budget.)
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, ".")

N_PROC = 2
LOCAL_DEVICES = 4
B = 8  # instance batch (global)
PORT = 29784


def worker(proc_id: int, n_proc: int, local_devices: int,
           tiny: bool = False) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={local_devices}"
    ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    try:  # the axon plugin would otherwise claim the backend
        from jax._src import xla_bridge as _xb

        for _k in list(getattr(_xb, "_backend_factories", {})):
            if "axon" in _k:
                _xb._backend_factories.pop(_k, None)
    except Exception:
        pass

    jax.distributed.initialize(
        coordinator_address=f"localhost:{PORT}",
        num_processes=n_proc,
        process_id=proc_id,
    )
    assert jax.device_count() == n_proc * local_devices
    assert jax.local_device_count() == local_devices

    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from gsv_tpu.circuit.runtime import PlanExecutor
    from gsv_tpu.core.labels import words_from_int, words_from_int_array
    from gsv_tpu.core.rng import GarblerRng
    from gsv_tpu.parallel.sharding import sharded_garble_step

    if tiny:
        from gsv_tpu.circuit.streaming import CircuitRunner
        from gsv_tpu.gadgets import bigint as bi
        from gsv_tpu.gadgets.bigint import BigIntWires

        def _circ(ctx, ins):
            a = BigIntWires(ins[:16])
            b = BigIntWires(ins[16:])
            return bi.mul(ctx, a, b).bits

        runner = CircuitRunner(_circ, 32)
    else:
        from gsv_tpu.models.groth16_verifier import fq_mul_model

        runner = fq_mul_model()
    plan = runner.plan
    mesh = Mesh(np.array(jax.devices()), ("instances",))

    # deterministic per-instance garbler state (seeds are the checkpoint —
    # every host can derive any instance's labels, so only the DATA is
    # sharded, never re-communicated)
    seeds = [101 + i for i in range(B)]
    rngs = [GarblerRng(s) for s in seeds]
    arenas = np.zeros((B, plan.arena_size, 4), dtype=np.uint32)
    for b, r in enumerate(rngs):
        arenas[b, 0, :] = words_from_int(r.false_label0)
        arenas[b, 1, :] = words_from_int(r.true_label0)
        arenas[b, plan.input_abs, :] = words_from_int_array(
            [r.issue_label0() for _ in range(plan.n_inputs)]
        )
    deltas = np.stack([words_from_int(r.delta) for r in rngs]).astype(np.uint32)

    # global arrays from process-local shards (the DCN-ready construction:
    # a real deployment builds only its local rows)
    sh3 = NamedSharding(mesh, P("instances", None, None))
    sh2 = NamedSharding(mesh, P("instances", None))
    per = B // n_proc
    lo, hi = proc_id * per, (proc_id + 1) * per
    g_arenas = jax.make_array_from_process_local_data(sh3, arenas[lo:hi], (B,) + arenas.shape[1:])
    g_deltas = jax.make_array_from_process_local_data(sh2, deltas[lo:hi], (B,) + deltas.shape[1:])

    t0 = time.time()
    step = sharded_garble_step(plan, mesh)
    outs, checksum = step(g_arenas, g_deltas)
    outs = multihost_utils.process_allgather(outs, tiled=True)
    checksum = np.asarray(jax.device_get(checksum))
    dt = time.time() - t0
    print(f"[proc {proc_id}] SPMD garble over {n_proc} hosts x "
          f"{local_devices} devices: {dt:.0f}s", flush=True)

    # single-process oracle on the same seeds
    want_sums = np.zeros((B, 4), dtype=np.uint32)

    def handler(cts):
        np.add(want_sums, np.asarray(cts).sum(axis=1, dtype=np.uint32),
               out=want_sums, casting="unsafe")

    want_out, _ = PlanExecutor(plan, batch=B).garble(
        arenas[:, plan.input_abs, :],
        deltas,
        np.stack([words_from_int(r.false_label0) for r in rngs]),
        np.stack([words_from_int(r.true_label0) for r in rngs]),
        ct_handler=handler,
    )
    assert (np.asarray(outs) == want_out).all(), "sharded labels diverge"
    want_checksum = want_sums.sum(axis=0, dtype=np.uint32)
    assert (checksum == want_checksum).all(), (checksum, want_checksum)
    print(f"[proc {proc_id}] MULTIHOST C&C PARITY OK "
          f"(labels + commitment checksum, {B} instances)", flush=True)


def main() -> None:
    tiny = "--tiny" in sys.argv
    if "--worker" in sys.argv:
        i = sys.argv.index("--worker")
        worker(int(sys.argv[i + 1]), int(sys.argv[i + 2]), int(sys.argv[i + 3]),
               tiny=tiny)
        return
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    n_proc = int(args[0]) if args else N_PROC
    local = int(args[1]) if len(args) > 1 else (2 if tiny else LOCAL_DEVICES)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker",
             str(p), str(n_proc), str(local)] + (["--tiny"] if tiny else []),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for p in range(n_proc)
    ]
    ok = 0
    for p, pr in enumerate(procs):
        out, _ = pr.communicate(timeout=900)
        sys.stdout.write(out)
        if pr.returncode == 0 and "PARITY OK" in out:
            ok += 1
    if ok == n_proc:
        print(f"MULTIHOST OK ({n_proc} processes)")
    else:
        print(f"MULTIHOST FAILED ({ok}/{n_proc})")
        sys.exit(1)


if __name__ == "__main__":
    main()
