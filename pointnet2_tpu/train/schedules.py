"""Learning-rate and batch-norm-momentum schedules.

Exact parity with the reference training drivers:
- LR: exponential staircase decay on examples-seen, clipped at 1e-5
  (train.py:86-94).
- BN momentum (the bn_decay schedule): 1 - 0.5 * 0.5^floor(examples/step),
  clipped at 0.99 — i.e. running stats adapt fast early and slowly late
  (train.py:96-104).

Both are functions of the optimizer step and jit-traceable.
"""

from __future__ import annotations

import jax.numpy as jnp


def exponential_decay_clipped(base_lr: float, batch_size: int,
                              decay_step: int, decay_rate: float,
                              min_lr: float = 1e-5):
    """Staircase exponential decay on examples seen, clipped below."""

    def schedule(step):
        exp = jnp.floor(step * batch_size / decay_step)
        lr = base_lr * jnp.power(decay_rate, exp)
        return jnp.maximum(lr, min_lr)

    return schedule


def bn_momentum_schedule(batch_size: int, decay_step: int,
                         init_decay: float = 0.5, decay_rate: float = 0.5,
                         clip: float = 0.99):
    """Scheduled BN momentum: min(clip, 1 - init*rate^floor(examples/step))."""

    def schedule(step):
        exp = jnp.floor(step * batch_size / decay_step)
        m = 1.0 - init_decay * jnp.power(decay_rate, exp)
        return jnp.minimum(m, clip)

    return schedule
