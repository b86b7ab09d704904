"""3D interpolation ops: three-NN search and inverse-distance interpolation.

TPU-native re-implementations of the reference 3d_interpolation op library
(/root/reference/tf_ops/3d_interpolation/tf_interpolate.cpp). Note the
reference registers these CPU-only — every feature-propagation layer
round-trips GPU->CPU->GPU in the original. Here everything stays on-device.

Semantics parity:
- ``three_nn`` returns SQUARED distances (tf_interpolate.cpp:73), 3 smallest
  with ties broken by lowest index (stable insertion, :74-89). No gradient
  (tf_interpolate.py: `ops.NoGradient('ThreeNN')`).
- ``three_interpolate`` computes out[j] = sum_i points[idx[j,i]] * w[j,i]
  (tf_interpolate.cpp:107-127). The reference backpropagates only into
  `points` (tf_interpolate.py:29-34 returns None for idx/weight); here the
  weight gradient is also defined (harmless — callers stop_gradient weights
  for exact parity), and the points gradient is a deterministic scatter-add.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def three_nn(xyz1: jax.Array, xyz2: jax.Array):
    """3 nearest neighbors of each unknown point among known points.

    xyz1: (B, N, 3) unknown (dense) points; xyz2: (B, M, 3) known (sparse).
    Returns (dist, idx): (B, N, 3) squared distances ascending, (B, N, 3)
    int32 indices into M.

    k=3 is extracted with three masked argmin passes rather than
    ``lax.top_k``: top_k lowers to a full sort along M, which at the
    sem-seg FP1 shape (B=16, N=8192, M=1024) costs ~40 ms on v5e — ~8x the
    cost of three min-reductions over the same distance matrix. argmin's
    first-occurrence rule reproduces the reference's lowest-index
    tie-breaking (tf_interpolate.cpp:74-89) exactly, as top_k did.
    """
    M = xyz2.shape[1]
    diff = xyz1[:, :, None, :] - xyz2[:, None, :, :]
    d2 = jnp.sum(jnp.square(diff), axis=-1)  # (B, N, M)
    if M < 3:
        # Fewer than 3 known points: the reference leaves missing slots at
        # their init values dist=1e40 (inf in f32), idx=0
        # (tf_interpolate.cpp:66-67) — inverse-distance weights then vanish.
        d2 = jnp.pad(d2, ((0, 0), (0, 0), (0, 3 - M)), constant_values=jnp.inf)
    lane = jnp.arange(d2.shape[-1])
    dists, idxs = [], []
    d = d2
    for _ in range(3):
        i = jnp.argmin(d, axis=-1)  # first occurrence = lowest-index ties
        v = jnp.min(d, axis=-1)  # == d[argmin]; fuses with the argmin pass
        dists.append(v)
        idxs.append(i)
        d = jnp.where(lane[None, None, :] == i[..., None], jnp.inf, d)
    dist = jnp.stack(dists, axis=-1)
    idx = jnp.stack(idxs, axis=-1)
    idx = jnp.where(idx >= M, 0, idx)
    return dist, idx.astype(jnp.int32)


@jax.custom_vjp
def three_interpolate(points: jax.Array, idx: jax.Array, weight: jax.Array) -> jax.Array:
    """Weighted 3-point interpolation.

    points: (B, M, C) known features; idx: (B, N, 3) int32; weight: (B, N, 3).
    Returns (B, N, C).
    """
    gathered = jnp.take_along_axis(points[:, None, :, :], idx[..., None], axis=2)
    return jnp.sum(gathered * weight[..., None], axis=2)


def _three_interpolate_fwd(points, idx, weight):
    return three_interpolate(points, idx, weight), (points, idx, weight)


def _three_interpolate_bwd(res, g):
    points, idx, weight = res
    B, M, C = points.shape
    N = idx.shape[1]
    # grad wrt points: scatter-add of g * w over the 3 neighbors
    # (deterministic XLA scatter; replaces tf_interpolate.cpp:131-153).
    contrib = (g[:, :, None, :] * weight[..., None]).reshape(B, N * 3, C)
    flat_idx = idx.reshape(B, N * 3)
    grad_points = jnp.zeros((B, M, C), g.dtype)
    grad_points = grad_points.at[jnp.arange(B)[:, None], flat_idx].add(contrib)
    # grad wrt weight: <g, points[idx]> per neighbor.
    gathered = jnp.take_along_axis(points[:, None, :, :], idx[..., None], axis=2)
    grad_weight = jnp.sum(gathered * g[:, :, None, :], axis=-1)
    return grad_points, None, grad_weight


three_interpolate.defvjp(_three_interpolate_fwd, _three_interpolate_bwd)
