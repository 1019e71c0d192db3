"""Mesh construction and sharded batched garbling.

Instance data-parallelism: the cut-and-choose batch axis is laid out across
an ``instances`` mesh axis; every chip garbles its shard of instances with
identical tapes (the plan is replicated — it is the *program*, instances are
the *data*).  Cross-chip aggregation (commitment digests, gate counters)
rides ``psum`` over ICI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gsv_tpu.circuit.link import Plan, TapeStep
from gsv_tpu.circuit.runtime import (
    _garble_segs,
    _scatter_outputs,
    seg_arg_list,
)


def instance_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("instances",))


def shard_instances(mesh: Mesh, arr):
    """Shard a batched array along its leading (instance) axis."""
    spec = P("instances", *([None] * (np.ndim(arr) - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def pad_instances(arr, n_devices: int):
    """Pad the leading instance axis up to a multiple of the mesh size.

    Uneven batches (instances % devices != 0) cannot lay out directly on the
    ``instances`` axis; deployments round the batch up with zero-seeded dummy
    instances (they garble garbage that is sliced away) — the analogue of the
    reference leaving rayon workers idle on the last chunk.  Returns
    ``(padded, n_real)``; slice results back with ``[:n_real]``.
    """
    arr = np.asarray(arr)
    n_real = arr.shape[0]
    pad = (-n_real) % n_devices
    if pad == 0:
        return arr, n_real
    z = np.zeros((pad,) + arr.shape[1:], arr.dtype)
    return np.concatenate([arr, z], axis=0), n_real


def sharded_garble_step(plan: Plan, mesh: Mesh):
    """Build a jitted step garbling a sharded batch of instances through the
    whole plan, returning per-instance output labels and a psum-aggregated
    ciphertext checksum (stands in for the stream commitment reduction).
    """
    steps = [s for s in plan.steps if isinstance(s, TapeStep)]
    inst = P("instances")
    repl = P()

    def one_instance(arena, delta):
        checksum = jnp.zeros((4,), jnp.uint32)
        for st in steps:
            gid_hi = jnp.uint32(st.gid_base >> 32)
            gid_lo = jnp.uint32(st.gid_base & 0xFFFFFFFF)
            hm = jnp.asarray(st.header_map)
            segs = [
                {f: jnp.asarray(v) for f, v in d.items()}
                for d in seg_arg_list(st.tape)
            ]
            token = jnp.zeros((st.tape.ct_count + 1, 0), jnp.uint32)
            arena, cts = _garble_segs(
                arena, token, hm, st.frame_base, delta, gid_hi, gid_lo, segs
            )
            arena = _scatter_outputs(
                arena, hm, st.frame_base,
                jnp.asarray(st.outputs_map), jnp.asarray(st.tape.out_ops),
            )
            if st.tape.ct_count:
                checksum = checksum + cts.sum(axis=0)
        out = arena[jnp.asarray(plan.output_abs)]
        return out, checksum

    def step(arenas, deltas):
        outs, checksums = jax.vmap(one_instance)(arenas, deltas)
        # aggregate a cross-instance digest over the mesh (ICI collective)
        total = jnp.sum(checksums.astype(jnp.uint32), axis=0)
        return outs, total

    return jax.jit(
        step,
        in_shardings=(NamedSharding(mesh, P("instances")), NamedSharding(mesh, P("instances"))),
        out_shardings=(NamedSharding(mesh, inst), NamedSharding(mesh, repl)),
    )
