"""Device mesh construction and sharding helpers.

The framework scales by pure data parallelism over a 1-D ``data`` mesh
(model is ~2M params; grads are psum'd over ICI within a slice and DCN
across slices by the same collective). This replaces the reference's
in-graph multi-GPU towers + CPU gradient averaging (train_multi_gpu.py:91-126)
with a single jit(shard_map(step)) program — n_devices=1 is the same code.

Multi-host: call `jax.distributed.initialize()` before `make_mesh()`; each
host feeds its local shard of the global batch (see
`pointnet2_tpu.train.trainer`).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: int | None = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over all (or the first `num_devices`) devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(
                f"requested {num_devices} devices, have {len(devices)}")
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data mesh."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(mesh: Mesh, batch, *, stacked: bool = False):
    """Device-put a host batch pytree with the batch axis sharded.

    Single-process: a plain sharded device_put of the global batch.
    Multi-host: each process passes its *local* shard and the global array
    is assembled across hosts (the local batch must be
    global_batch / process_count rows, in process_index order).

    With ``stacked=True`` the arrays carry a leading steps axis (K, B, ...)
    and axis 1 is the sharded batch axis (make_train_multi_step layout).
    """
    sh = NamedSharding(mesh, P(None, DATA_AXIS) if stacked else P(DATA_AXIS))
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sh, x), batch)
