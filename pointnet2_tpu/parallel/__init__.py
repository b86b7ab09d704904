"""Device-mesh and sharding utilities for data-parallel scale-out."""

from pointnet2_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
