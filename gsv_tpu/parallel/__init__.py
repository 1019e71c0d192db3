"""Device-mesh parallelism: instance sharding and collectives.

The reference's only multi-core axis is cut-and-choose instance parallelism
on a pinned rayon pool (cut_and_choose/mod.rs:131-186).  Here instances are a
batch axis sharded over a ``jax.sharding.Mesh`` — data parallelism across
chips/hosts with XLA collectives aggregating commitments and gate counts.
"""

from gsv_tpu.parallel.sharding import (  # noqa: F401
    instance_mesh,
    shard_instances,
    sharded_garble_step,
)
