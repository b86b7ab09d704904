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


def process_shard(num_items: int) -> tuple[int, int]:
    """(start, stop) of this host's contiguous shard of a dataset."""
    rank, count = jax.process_index(), jax.process_count()
    per = num_items // count
    start = rank * per
    stop = start + per if rank < count - 1 else num_items
    return start, stop


def local_batch_size(global_batch: int) -> int:
    count = jax.process_count()
    if global_batch % count:
        raise ValueError(
            f"global batch {global_batch} not divisible by {count} hosts")
    return global_batch // count
