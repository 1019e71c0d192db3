"""Instance-DP scaling proxy on a virtual CPU mesh (BASELINE.md asks >=85%
efficiency at 16 instances / 2 hosts; real multi-chip hardware is not
available here, so this measures the SPMD path's weak-scaling efficiency on
`--xla_force_host_platform_device_count` devices).

Weak scaling: per-device batch fixed at 1 instance; wall time per instance
at N devices vs 1 device.  On a 4-core host the virtual devices contend for
cores beyond N=4, so N<=cores is the honest proxy regime; the point of the
measurement is the *sharding overhead* (psum of the checksum, layout) —
compute is embarrassingly parallel by construction.

Usage: python scripts/bench_mesh_scaling.py [n_devices] [reps]
"""

import os
import sys
import time

sys.path.insert(0, ".")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={N}"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
try:
    from jax._src import xla_bridge as _xb

    for _k in list(getattr(_xb, "_backend_factories", {})):
        if "axon" in _k:
            _xb._backend_factories.pop(_k, None)
except Exception:
    pass

import numpy as np

from gsv_tpu.core.jitcache import enable_cpu


def run(n_dev: int, reps: int) -> float:
    """Seconds per instance garbling the fq-mul plan, batch = n_dev."""
    from gsv_tpu.core.labels import words_from_int
    from gsv_tpu.core.rng import GarblerRng
    from gsv_tpu.models.groth16_verifier import fq_mul_model
    from gsv_tpu.parallel.sharding import (
        instance_mesh,
        shard_instances,
        sharded_garble_step,
    )

    runner = fq_mul_model()
    plan = runner.plan
    mesh = instance_mesh(n_dev)
    step = sharded_garble_step(plan, mesh)

    B = n_dev
    arenas = np.zeros((B, plan.arena_size, 4), dtype=np.uint32)
    deltas = np.zeros((B, 4), dtype=np.uint32)
    for i in range(B):
        rng = GarblerRng(1 + i)
        arenas[i, 0] = words_from_int(rng.false_label0)
        arenas[i, 1] = words_from_int(rng.true_label0)
        for k in range(plan.n_inputs):
            arenas[i, plan.input_abs[k]] = words_from_int(rng.issue_label0())
        deltas[i] = words_from_int(rng.delta)
    a = shard_instances(mesh, arenas)
    d = shard_instances(mesh, deltas)

    _, ck = step(a, d)
    np.asarray(ck)  # warm + honest sync
    t0 = time.perf_counter()
    for _ in range(reps):
        _, ck = step(a, d)
        np.asarray(ck)
    dt = (time.perf_counter() - t0) / reps
    return dt / B, runner.template.total_gates


def main() -> None:
    enable_cpu()
    print(f"devices: {jax.device_count()}", flush=True)
    t1, gates = run(1, REPS)
    tN, _ = run(N, REPS)
    # weak scaling: wall(B=1 on 1 dev) vs wall(B=N on N devs); run() returns
    # wall/instance, so ideal is tN == t1/N and efficiency = t1 / (N * tN)
    eff = t1 / (N * tN)
    print(
        f"fq-mul garble ({gates:,} gates/instance): "
        f"1 dev {t1:.3f}s/inst, {N} dev {tN:.3f}s/inst -> "
        f"weak-scaling efficiency {eff:.1%} (speedup {t1/tN:.2f}x on {N} dev)",
        flush=True,
    )


if __name__ == "__main__":
    main()
