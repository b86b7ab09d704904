"""Orbax checkpointing with full resume.

Improves on the reference's tf.train.Saver usage (train.py:144,181-183),
which never restores the epoch/step counters — training always restarted
from epoch 0. Here (params, batch_stats, opt_state, step) round-trip, so
resume is exact.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from pointnet2_tpu.train.state import TrainState


def save_checkpoint(directory: str, state: TrainState, name: str = "ckpt") -> str:
    path = os.path.join(os.path.abspath(directory), name)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state), force=True)
    return path


def restore_checkpoint(directory: str, template: TrainState,
                       name: str = "ckpt") -> TrainState:
    path = os.path.join(os.path.abspath(directory), name)
    with ocp.StandardCheckpointer() as ckptr:
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                          jax.device_get(template))
        return ckptr.restore(path, abstract)


def latest_step(directory: str, name: str = "ckpt") -> int | None:
    path = os.path.join(os.path.abspath(directory), name)
    return 0 if os.path.isdir(path) else None
