"""Lockstep batch iteration for host-sharded protocol evaluation.

Every jit(shard_map) dispatch is a collective across processes, so when
eval data is host-sharded (cli.evaluate --multihost) all hosts MUST issue
the same number of eval dispatches or the job deadlocks. Hosts agree on
the MAX per-host batch count; exhausted hosts feed zero-filled batches
with nvalid=0, which contribute nothing to the (allreduced) counters —
the same contract Trainer.eval_epoch uses (train/trainer.py).

The zero batch comes from the dataset's shape metadata
(``dataset.zero_batch()``), NOT from the first locally-seen batch: at many
hosts / small eval splits a host's shard can legally hold ZERO batches
(multihost.shard_bounds gives non-final ranks ``num_items // count`` items,
which is 0 when items < hosts), and such a host still has to feed
`num_global` padding batches.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np


def _zero_like_batch(template: dict) -> dict:
    out = {}
    for k, v in template.items():
        if k == "nvalid":
            out[k] = 0
        else:
            out[k] = np.zeros_like(np.asarray(v))
    return out


def lockstep_batches(dataset, multihost, **epoch_kw) -> Iterator[dict]:
    """dataset.epoch() padded to the cross-process max batch count."""
    num_global = multihost.sync_num_batches(dataset.num_batches(),
                                            reduce="max")
    it = iter(dataset.epoch(augment=False, **epoch_kw))
    zero = None
    for _ in range(num_global):
        batch = next(it, None)
        if batch is None:
            if zero is None:
                zero = dataset.zero_batch()
            # fresh arrays each time: consumers may write into the batch
            batch = _zero_like_batch(zero)
        yield batch
