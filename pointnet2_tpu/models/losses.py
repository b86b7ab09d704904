"""Loss functions shared by the model families.

Parity with the reference get_loss definitions:
- classification / part-seg: mean sparse softmax cross-entropy
  (models/pointnet2_cls_ssg.py:47-54, models/pointnet2_part_seg.py:44-51).
- semantic seg: weighted CE with sum(w*ce)/count_nonzero(w) reduction,
  matching tf.losses.sparse_softmax_cross_entropy's default
  SUM_BY_NONZERO_WEIGHTS (models/pointnet2_sem_seg.py:48-55).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def classification_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                        sample_weight: jnp.ndarray | None = None,
                        sum_count: bool = False):
    """logits (B, C), labels (B,) int -> scalar mean CE.

    `sample_weight` (B,) masks padded rows out of the reduction (the
    reference instead trains on the stale tail rows of its reused feed
    buffer, train.py:203-210 — a documented improvement here).
    `sum_count=True` returns the unreduced (weighted_sum, weight_count)
    pair so a data-parallel caller can normalize by the GLOBAL valid
    count (steps_body) instead of the local one."""
    ce = optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), labels)
    if sample_weight is None:
        sample_weight = jnp.ones_like(ce)
    num = jnp.sum(ce * sample_weight)
    den = sample_weight.sum()
    if sum_count:
        return num, den
    return num / jnp.maximum(den, 1.0)


def segmentation_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                      sample_weight: jnp.ndarray | None = None,
                      sum_count: bool = False):
    """logits (B, N, C), labels (B, N) int -> scalar mean per-point CE.
    `sample_weight` (B,) masks padded examples (see classification_loss)."""
    ce = optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), labels)
    n = ce.shape[1]
    if sample_weight is None:
        sample_weight = jnp.ones(ce.shape[0], ce.dtype)
    num = jnp.sum(ce * sample_weight[:, None])
    den = sample_weight.sum() * n
    if sum_count:
        return num, den
    return num / jnp.maximum(den, 1.0)


def weighted_segmentation_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                               smpw: jnp.ndarray,
                               sample_weight: jnp.ndarray | None = None,
                               sum_count: bool = False):
    """Per-point weighted CE, normalized by the number of nonzero weights."""
    if sample_weight is not None:
        smpw = smpw * sample_weight[:, None]
    ce = optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), labels)
    num = jnp.sum(ce * smpw)
    den = jnp.sum(smpw != 0).astype(jnp.float32)
    if sum_count:
        return num, den
    return num / jnp.maximum(den, 1.0)
