"""Lockstep batch iteration for host-sharded protocol evaluation.

Every jit(shard_map) dispatch is a collective across processes, so when
eval data is host-sharded (cli.evaluate --multihost) all hosts MUST issue
the same number of eval dispatches or the job deadlocks. Hosts agree on
the MAX per-host batch count; exhausted hosts feed zero-filled batches
with nvalid=0, which contribute nothing to the (allreduced) counters —
the same contract Trainer.eval_epoch uses (train/trainer.py).
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
    template = None
    for _ in range(num_global):
        batch = next(it, None)
        if batch is None:
            assert template is not None, "no local batches to template from"
            batch = _zero_like_batch(template)
        else:
            template = batch
        yield batch
