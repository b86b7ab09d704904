"""Training state pytree and optimizer construction."""

from __future__ import annotations

from typing import Any

import flax.struct
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray  # int32 scalar
    params: Any
    batch_stats: Any
    opt_state: Any


def make_optimizer(name: str, lr_schedule, momentum: float = 0.9):
    """adam | momentum, matching train.py:133-138 (lr is scheduled)."""
    if name == "adam":
        return optax.adam(lr_schedule)
    if name == "momentum":
        return optax.sgd(lr_schedule, momentum=momentum)
    raise ValueError(f"unknown optimizer {name!r} (want 'adam' or 'momentum')")
