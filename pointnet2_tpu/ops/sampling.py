"""Sampling ops: farthest point sampling, point gather, probability sampling.

TPU-native re-implementations of the reference sampling op library
(/root/reference/tf_ops/sampling/tf_sampling.cpp:14-63 and
tf_sampling_g.cu), with reference-exact semantics:

- ``farthest_point_sample``: seed is always index 0; iteratively selects the
  point with the maximum min-distance to the selected set; ties broken by
  lowest index (tf_sampling_g.cu:105-170). Index-producing — no gradient
  (tf_sampling.py:57 `ops.NoGradient('FarthestPointSample')`).
- ``gather_point``: gathers (b,m,3) from (b,n,3) by (b,m) indices; gradient
  is a scatter-add into the source (tf_sampling_g.cu:172-192). Here the
  scatter-add is a deterministic XLA scatter — no atomics, no races.
- ``prob_sample``: cumulative-sum + binary-search categorical sampling
  (tf_sampling_g.cu:7-104). No gradient.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pointnet2_tpu import config


# ---------------------------------------------------------------------------
# farthest point sampling
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("npoint",))
def _fps_xla(xyz: jax.Array, npoint: int) -> jax.Array:
    """Pure-XLA FPS via lax.scan. xyz: (B, N, 3) -> (B, npoint) int32."""
    B, N, _ = xyz.shape
    xyz = xyz.astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)

    def body(carry, _):
        min_dist, last = carry  # (B, N), (B,) int32
        last_xyz = jnp.take_along_axis(xyz, last[:, None, None], axis=1)
        dist = jnp.sum(jnp.square(xyz - last_xyz), axis=-1)  # (B, N)
        min_dist = jnp.minimum(min_dist, dist)
        # argmax with lowest-index tie-break (jnp.argmax semantics).
        best = jnp.max(min_dist, axis=1, keepdims=True)
        nxt = jnp.min(jnp.where(min_dist == best, col, N), axis=1).astype(jnp.int32)
        return (min_dist, nxt), nxt

    init = (jnp.full((B, N), 1e38, jnp.float32), jnp.zeros((B,), jnp.int32))
    if npoint == 1:
        return jnp.zeros((B, 1), jnp.int32)
    (_, _), rest = jax.lax.scan(body, init, None, length=npoint - 1)
    return jnp.concatenate([jnp.zeros((B, 1), jnp.int32), rest.T], axis=1)


def farthest_point_sample(xyz: jax.Array, npoint: int, impl: str | None = None) -> jax.Array:
    """Iterative farthest point sampling.

    Args:
      xyz: (B, N, 3) float array of point coordinates.
      npoint: number of points to select (<= N).
    Returns:
      (B, npoint) int32 indices into N. The first index is always 0.
    """
    # Index-producing: no gradient, like the reference's ops.NoGradient
    # (tf_sampling.py:22). stop_gradient also keeps reverse-mode AD from
    # trying to linearize the Pallas custom call (which has no JVP rule).
    # NOTE: the dispatcher itself is not jitted — resolve_impl must re-read
    # the config global on every eager call (a jitted dispatcher would pin
    # the first-resolved implementation in its trace cache).
    xyz = jax.lax.stop_gradient(xyz)
    resolved = config.resolve_impl(impl)
    if resolved == "pallas":
        from pointnet2_tpu.ops.pallas.fps import fps_pallas

        return fps_pallas(xyz, npoint)
    return _fps_xla(xyz, npoint)


# ---------------------------------------------------------------------------
# gather_point
# ---------------------------------------------------------------------------


@jax.custom_vjp
def _gather_point_xla(points: jax.Array, idx: jax.Array) -> jax.Array:
    return jnp.take_along_axis(points, idx[:, :, None], axis=1)


@jax.custom_vjp
def _gather_point_mxu(points: jax.Array, idx: jax.Array) -> jax.Array:
    from pointnet2_tpu.ops.grouping import onehot_gather_rows

    return onehot_gather_rows(points, idx)


def _gather_point_mxu_fwd(points, idx):
    return _gather_point_mxu(points, idx), (idx, points.shape[1])


def _gather_point_mxu_bwd(res, g):
    from pointnet2_tpu.ops.grouping import onehot_scatter_rows

    idx, n = res
    return onehot_scatter_rows(g, idx, n), None


_gather_point_mxu.defvjp(_gather_point_mxu_fwd, _gather_point_mxu_bwd)


def gather_point(points: jax.Array, idx: jax.Array,
                 impl: str | None = None) -> jax.Array:
    """Gather rows of points by per-batch indices.

    points: (B, N, C); idx: (B, M) int32 -> (B, M, C).
    Gradient w.r.t. points is a deterministic scatter-add; idx gets none
    (mirrors GatherPoint/GatherPointGrad, tf_sampling.cpp:41-63). On TPU
    both directions run as one-hot MXU contractions (the ``mxu`` einsum
    formulation by default; Pallas kernels via impl="pallas").
    """
    resolved = config.resolve_gather_impl(impl)
    is_float = jnp.issubdtype(points.dtype, jnp.floating)
    # one-hot MXU formulations (pallas and mxu) accumulate in f32 — exact
    # for float payloads but corrupting for integers above 2^24
    if resolved == "pallas" and is_float:
        from pointnet2_tpu.ops.pallas.group import gather_point_pallas

        return gather_point_pallas(points, idx)
    if resolved == "mxu" and is_float:
        return _gather_point_mxu(points, idx)
    return _gather_point_xla(points, idx)


def _gather_point_fwd(points, idx):
    return _gather_point_xla(points, idx), (idx, points.shape[1])


def _gather_point_bwd(res, g):
    idx, n = res
    B, M, C = g.shape
    grad = jnp.zeros((B, n, C), g.dtype)
    grad = grad.at[jnp.arange(B)[:, None], idx].add(g)
    return grad, None


_gather_point_xla.defvjp(_gather_point_fwd, _gather_point_bwd)


# ---------------------------------------------------------------------------
# prob_sample
# ---------------------------------------------------------------------------


@jax.jit
def prob_sample(inp: jax.Array, inpr: jax.Array) -> jax.Array:
    """Sample categorical indices proportional to unnormalized weights.

    inp: (B, N) float32 unnormalized weights (e.g. triangle areas);
    inpr: (B, M) float32 uniform randoms in [0, 1).
    Returns (B, M) int32 indices: the smallest r with cumsum(inp)[r] >= u *
    cumsum(inp)[-1] (binary-search lower bound, tf_sampling_g.cu:90-104).
    """
    cs = jnp.cumsum(inp.astype(jnp.float32), axis=1)  # (B, N)
    q = inpr.astype(jnp.float32) * cs[:, -1:]  # (B, M)
    idx = jax.vmap(lambda c, r: jnp.searchsorted(c, r, side="left"))(cs, q)
    return jnp.minimum(idx, inp.shape[1] - 1).astype(jnp.int32)
