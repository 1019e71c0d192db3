"""Multi-chip cut-and-choose: instances sharded over a device mesh.

The reference scales cut-and-choose with a pinned rayon pool — one instance
per physical core (``cut_and_choose/mod.rs:131-186``).  The TPU-native
layout is SPMD: the instance batch axis is sharded over an ``instances``
mesh axis, every chip garbles its shard of instances with the same
(replicated) plan, and commitments come back per instance.  Here the mesh
is 8 virtual CPU devices (`xla_force_host_platform_device_count`) so the
multi-chip path runs anywhere; on a pod slice the same code shards over
real chips with XLA moving nothing but the tiny label/commit outputs.

Usage: python examples/multichip_cut_and_choose.py [n_devices]
"""

import os
import random
import sys
import time

sys.path.insert(0, ".")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8

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

from gsv_tpu.circuit.ciphertext import ArraySource, CollectHandler, HashHandler, TeeHandler
from gsv_tpu.circuit.streaming import EvaluatedWire
from gsv_tpu.models.groth16_verifier import fq_mul_model
from gsv_tpu.parallel.sharding import instance_mesh
from gsv_tpu.protocol.cut_and_choose import Config, Evaluator, Garbler


def main():
    assert len(jax.devices()) >= N, jax.devices()
    mesh = instance_mesh(N)
    runner = fq_mul_model()
    cfg = Config(total=N, to_finalize=2)
    print(
        f"instances: {N} x {runner.template.total_gates:,} gates, "
        f"sharded over {N} devices: {[str(d) for d in mesh.devices.flat][:3]}..."
    )

    t0 = time.time()
    garbler = Garbler(runner, cfg, mesh=mesh)
    garbler.create()
    commits = garbler.commit()
    print(f"[garbler] SPMD batched garbling + commits in {time.time() - t0:.0f}s")

    ev = Evaluator(random.Random(), cfg, commits)
    print(f"[evaluator] challenge: finalize {ev.to_finalize}")

    open_seeds, regarble = garbler.open_commit(ev.to_finalize)
    streams, hashes = {}, {}

    def factory(i):
        col, hsh = CollectHandler(), HashHandler()
        streams[i], hashes[i] = col, hsh
        return TeeHandler(col, hsh)

    regarble(factory)
    ev.check_opened(runner, open_seeds)
    print("[evaluator] opened instances re-garbled + commits verified")

    rng = random.Random(1)
    bits = [bool(rng.getrandbits(1)) for _ in range(runner.n_inputs)]
    for i in ev.to_finalize:
        ev.check_finalized_stream_hash(i, hashes[i].finalize())
        inst = garbler.instances[i]
        inputs = [
            EvaluatedWire(gw.select(b), b) for gw, b in zip(inst.input_labels, bits)
        ]
        out = ev.evaluate(
            runner,
            i,
            inputs,
            true_label=inst.true_wire.select(True),
            false_label=inst.false_wire.select(False),
            ct_source=ArraySource(streams[i].stream()),
        )
        print(f"[evaluator] instance {i}: value={out.value} (all checks passed)")
    print("MULTICHIP C&C OK")


if __name__ == "__main__":
    main()
