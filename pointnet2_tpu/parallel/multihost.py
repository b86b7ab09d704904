"""Multi-host initialization and per-host input sharding.

Scaling beyond one host is the same jit(shard_map(step)) program over a
bigger mesh; this module provides the three pieces that differ:

1. :func:`initialize` — `jax.distributed.initialize` wrapper (call before
   any jax op; coordinator/process info can come from args or the standard
   env vars/TPU metadata).
2. :func:`process_shard` — which slice of the dataset this host owns.
3. `mesh.shard_batch` handles assembling a global batch from host-local
   shards via `jax.make_array_from_process_local_data`.

There is no NCCL/MPI equivalent to configure: gradient psum compiles to
ICI collectives within a slice and DCN across slices.
"""

from __future__ import annotations

import jax


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize the multi-host runtime.

    Must run before any other jax call: even an innocuous query like
    ``jax.process_count()`` initializes the (single-process) backend and
    makes ``jax.distributed.initialize`` fail afterwards — which is why
    this function must not probe jax state first (caught by
    tests/test_multiprocess.py). With explicit coordinator info the call
    is strict (errors surface); without, failures mean a single-process
    environment and are ignored."""
    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
        return
    try:
        jax.distributed.initialize()
    except (ValueError, RuntimeError):
        # single-process / already-initialized environments
        pass


def is_primary() -> bool:
    """True on the process that owns shared-filesystem side effects
    (checkpoint writes, log files, source snapshots)."""
    return jax.process_index() == 0


def sync_num_batches(local_num_batches: int, reduce: str = "min") -> int:
    """Agree on a per-epoch batch count across hosts.

    Host-sharded datasets can disagree on num_batches (the last host owns
    the remainder). Every jit(shard_map) dispatch is lockstep across
    processes, so hosts MUST run the same number of steps or the job
    deadlocks. Training uses reduce="min" (the surplus tail batches are
    skipped — at most hosts-1 batches/epoch, and the epoch shuffle means
    different items each time); evaluation uses reduce="max" and exhausted
    hosts feed zero-masked padding batches so nothing is dropped.
    """
    if jax.process_count() == 1:
        return local_num_batches
    import numpy as np
    from jax.experimental import multihost_utils

    counts = np.asarray(
        multihost_utils.process_allgather(np.int64(local_num_batches)))
    return int(counts.min() if reduce == "min" else counts.max())


def allreduce_sum(x):
    """Sum a host-local numpy array across all processes (no-op on one)."""
    if jax.process_count() == 1:
        return x
    import numpy as np
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(np.asarray(x))).sum(0)


def to_local_numpy(x, mesh, spec):
    """This process's shard of a batch-sharded jax.Array as numpy.

    Host-sharded evaluation feeds local rows through a global shard_map
    dispatch; the output rows matching THIS host's inputs are its local
    shard (a global fetch would pair other hosts' logits with local
    labels). Single-process: plain asarray."""
    import numpy as np

    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(
        multihost_utils.global_array_to_host_local_array(x, mesh, spec))


def barrier(name: str) -> None:
    """Block until every process reaches this point (no-op on one)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def shard_bounds(num_items: int, rank: int, count: int) -> tuple[int, int]:
    """(start, stop) of `rank`'s contiguous shard; the remainder goes to
    the last rank. The single source of the sharding policy — dataset
    loaders slice with this so every host agrees on shard sizes (lockstep
    dispatch counts depend on it)."""
    per = num_items // count
    start = rank * per
    stop = start + per if rank < count - 1 else num_items
    return start, stop


def process_shard(num_items: int) -> tuple[int, int]:
    """(start, stop) of this host's contiguous shard of a dataset."""
    return shard_bounds(num_items, jax.process_index(), jax.process_count())


def local_batch_size(global_batch: int) -> int:
    count = jax.process_count()
    if global_batch % count:
        raise ValueError(
            f"global batch {global_batch} not divisible by {count} hosts")
    return global_batch // count
