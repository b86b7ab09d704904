"""Gradient-safe max pooling over a tensor axis.

Why this exists: the straightforward ``jnp.max(x, axis)`` differentiates via
an equality mask — XLA re-materializes ``x == broadcast(max)`` in the
backward pass. On TPU, when ``x`` is a bfloat16 value produced by float32
arithmetic inside the same fused computation (the usual mixed-precision
layout: f32 BatchNorm -> cast bf16 -> pool), the two sides of that ``eq``
can be computed at *different effective precisions* (the fusion elides or
reorders the f32->bf16 converts), so the mask misses the true maximum for
most (or all) windows and the gradient silently collapses to ~0. Measured
on TPU v5e: ``grad(sum(max(bf16_affine(x), axis)))`` returned exactly 0
while the identical program on CPU returned the correct gradient; even an
explicit f32 round-trip around the reduce did not survive the simplifier.

The fix never compares floats: the forward saves the *integer* argmax and
the backward routes the cotangent through an iota==index mask. Tie-break is
first-occurrence (lowest index) — deterministic, matching the tie rule of
the reference's CUDA kernels (e.g. FPS, tf_sampling_g.cu:124-168), and a
documented delta from TF's reduce_max gradient which splits evenly among
exact ties (ties have measure zero in f32; in bf16 an even split is exactly
the rounding-sensitive behavior we're avoiding).

Used by every pooling site on the autodiff path: the SA-module pooling
modes (nn/pointnet.py), MSG per-scale pooling, and the PointNet v1 global
max (models/cls_basic.py). Reductions outside autodiff (FPS distance
maxima, eval argmax) keep plain jnp reductions.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def max_pool(x: jax.Array, axis: int) -> jax.Array:
    """``jnp.max(x, axis)`` with a precision-robust gradient.

    Backward routes the cotangent to the first-occurring maximum via the
    saved integer argmax (no float equality — see module docstring).
    """
    return jnp.max(x, axis=axis)


def _max_pool_fwd(x, axis):
    axis = axis % x.ndim
    idx = jnp.argmax(x, axis=axis).astype(jnp.int32)
    # residuals must be jax values: carry the pooled-axis length as an iota
    # array (its static shape is the length; its values are the positions).
    iota = jax.lax.iota(jnp.int32, x.shape[axis])
    return jnp.max(x, axis=axis), (idx, iota)


def _max_pool_bwd(axis, res, g):
    idx, iota = res
    axis = axis % (g.ndim + 1)
    shape = [1] * (g.ndim + 1)
    shape[axis] = iota.shape[0]
    mask = iota.reshape(shape) == jnp.expand_dims(idx, axis)
    gx = jnp.where(mask, jnp.expand_dims(g, axis), jnp.zeros((), g.dtype))
    return (gx,)


max_pool.defvjp(_max_pool_fwd, _max_pool_bwd)
