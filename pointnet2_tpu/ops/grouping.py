"""Grouping ops: fixed-radius ball query, neighbor gather, kNN.

TPU-native re-implementations of the reference grouping op library
(/root/reference/tf_ops/grouping/tf_grouping.cpp:13-63 and
tf_grouping_g.cu), with reference-exact semantics:

- ``query_ball_point``: for each query, the indices of the FIRST `nsample`
  dataset points (in scan order k=0..n-1) with Euclidean distance < radius;
  remaining slots are padded with the first hit so that max-pooling over the
  group ignores padding (tf_grouping_g.cu:14-33). Also returns the number of
  in-ball points, capped at nsample. Index-producing — no gradient.
- ``group_point``: gathers (b,m,nsample,c) neighbor features from (b,n,c) by
  (b,m,nsample) indices; gradient is a deterministic scatter-add
  (tf_grouping_g.cu:40-78 — the reference uses atomicAdd; here XLA scatter,
  no atomics, no races).
- ``knn_point``: k nearest neighbors by squared distance, ties broken by
  lowest index — replaces the reference's SelectionSort kernel
  (tf_grouping_g.cu:83-123) with `lax.top_k`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pointnet2_tpu import config


def _pairwise_sqdist(xyz2: jax.Array, xyz1: jax.Array) -> jax.Array:
    """Squared distances (B, M, N) between queries xyz2 (B,M,3) and dataset
    xyz1 (B,N,3), computed by explicit differences (exact, fusible)."""
    diff = xyz2[:, :, None, :] - xyz1[:, None, :, :]
    return jnp.sum(jnp.square(diff), axis=-1)


@partial(jax.jit, static_argnames=("radius", "nsample"))
def _ball_query_xla(radius, nsample, xyz1, xyz2):
    B, N, _ = xyz1.shape
    d2 = _pairwise_sqdist(xyz2, xyz1)  # (B, M, N)
    # d = max(sqrt(d2), 1e-20) < radius  <=>  d2 < radius**2 (radius > 1e-20)
    mask = d2 < jnp.float32(radius) ** 2
    col = jax.lax.broadcasted_iota(jnp.int32, mask.shape, 2)
    keys = jnp.where(mask, col, N)
    if nsample > N:  # fewer dataset points than slots: pad with misses
        keys = jnp.pad(keys, ((0, 0), (0, 0), (0, nsample - N)),
                       constant_values=N)
    # nsample smallest keys ascending == first nsample hits in scan order.
    idx = -jax.lax.top_k(-keys, nsample)[0]  # (B, M, nsample)
    cnt = jnp.minimum(jnp.sum(mask, axis=-1), nsample).astype(jnp.int32)
    first = idx[..., :1]
    slot = jax.lax.broadcasted_iota(jnp.int32, idx.shape, 2)
    idx = jnp.where(slot < cnt[..., None], idx, first)
    idx = jnp.where(first == N, 0, idx)  # no point in ball: define as 0
    return idx.astype(jnp.int32), cnt


def query_ball_point(radius: float, nsample: int, xyz1: jax.Array, xyz2: jax.Array,
                      impl: str | None = None):
    """Fixed-radius near-neighbor search with padded fixed-size output.

    Args:
      radius: ball radius (Euclidean).
      nsample: max neighbors per ball.
      xyz1: (B, N, 3) dataset points.
      xyz2: (B, M, 3) query points.
    Returns:
      idx: (B, M, nsample) int32 indices into N (first-nsample-in-scan-order,
        padded with the first hit).
      pts_cnt: (B, M) int32 number of in-ball points, capped at nsample.
    """
    # Index-producing: no gradient (reference: ops.NoGradient,
    # tf_grouping.py:21,32); stop_gradient keeps AD from linearizing the
    # Pallas custom call.
    xyz1 = jax.lax.stop_gradient(xyz1)
    xyz2 = jax.lax.stop_gradient(xyz2)
    resolved = config.resolve_impl(impl)
    if resolved == "pallas":
        from pointnet2_tpu.ops.pallas.ball_query import ball_query_pallas

        return ball_query_pallas(radius, nsample, xyz1, xyz2)
    return _ball_query_xla(radius, nsample, xyz1, xyz2)


def query_ball_point_multi(radii, nsamples, xyz1: jax.Array,
                           xyz2: jax.Array, impl: str | None = None):
    """Ball query at several radii over the SAME (dataset, queries) pair.

    Semantically identical to ``[query_ball_point(r, ns, xyz1, xyz2) for
    r, ns in zip(radii, nsamples)]`` (the reference's MSG loop,
    utils/pointnet_util.py:168); the Pallas path computes the
    (query, dataset) squared-distance tile ONCE and reruns only the
    per-radius rank-cumsum/slot machinery on the in-VMEM tile.

    NOTE: measured on TPU v5e the fusion does NOT pay — the tile build
    is ~2-8% of the kernel's work (slot extraction dominates at
    ~2*nsample VPU ops per lane) and the fused kernel holds more live
    VMEM, so it runs 1-27% slower than independent calls
    (benchmarks/probe_ballq_multi.py; docs/PERF.md negative results).
    The MSG stacks therefore use per-radius query_ball_point; this op is
    kept as API surface for hardware where the balance differs.

    Returns a tuple of (idx (B,M,nsample_i) i32, cnt (B,M) i32) pairs.
    """
    xyz1 = jax.lax.stop_gradient(xyz1)
    xyz2 = jax.lax.stop_gradient(xyz2)
    if config.resolve_impl(impl) == "pallas":
        from pointnet2_tpu.ops.pallas.ball_query import (
            ball_query_multi_pallas,
        )

        return ball_query_multi_pallas(tuple(radii), tuple(nsamples),
                                       xyz1, xyz2)
    return tuple(_ball_query_xla(r, ns, xyz1, xyz2)
                 for r, ns in zip(radii, nsamples))


def query_ball_and_group_xyz(radius: float, nsample: int, xyz1: jax.Array,
                             xyz2: jax.Array, impl: str | None = None):
    """Fused ball query + neighbor-coordinate gather (one kernel pass).

    Equivalent to ``idx, cnt = query_ball_point(...)`` followed by
    ``group_point(xyz1, idx)`` but without materialising a second one-hot
    gather pass (the selection mask computed during the ball query extracts
    the coordinates directly). Gradient w.r.t. xyz1 is the same
    deterministic scatter-add as group_point's; idx/cnt produce none.

    Returns (idx (B,M,nsample) i32, pts_cnt (B,M) i32,
    grouped_xyz (B,M,nsample,3) uncentered).
    """
    if config.resolve_impl(impl) == "pallas":
        return _bq_group_pallas(radius, nsample, xyz1, xyz2)
    idx, cnt = _ball_query_xla(radius, nsample, xyz1, xyz2)
    # forward the caller's impl so an explicit impl="xla"/"mxu" isolates that
    # gather path end to end; impl=None keeps the default dispatch (mxu
    # one-hot on TPU — its scatter-grad is the measured-fast path)
    return idx, cnt, group_point(xyz1, idx, impl=impl)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _bq_group_pallas(radius, nsample, xyz1, xyz2):
    from pointnet2_tpu.ops.pallas.ball_query import (
        ball_query_group_xyz_pallas,
    )

    return ball_query_group_xyz_pallas(radius, nsample, xyz1, xyz2)


def _bqg_fwd(radius, nsample, xyz1, xyz2):
    out = _bq_group_pallas(radius, nsample, xyz1, xyz2)
    return out, (out[0], xyz1.shape[1], xyz2.shape)


def _bqg_bwd(radius, nsample, res, g):
    idx, n, q_shape = res
    dg = g[2]  # cotangent of grouped_xyz; idx/cnt are int outputs
    B, m, s, C = dg.shape
    # the MXU one-hot scatter, not the Pallas one: measured ~16x faster
    # for the gather gradient at these shapes (docs/PERF.md)
    grad = onehot_scatter_rows(dg.reshape(B, m * s, C),
                               idx.reshape(B, m * s), n)
    return grad, jnp.zeros(q_shape, grad.dtype)


_bq_group_pallas.defvjp(_bqg_fwd, _bqg_bwd)


@jax.custom_vjp
def _group_point_xla(points: jax.Array, idx: jax.Array) -> jax.Array:
    return jnp.take_along_axis(points[:, None, :, :], idx[..., None], axis=2)


def _exact_gather_precision(dtype):
    from pointnet2_tpu.ops.pallas.util import exact_copy_precision

    return exact_copy_precision(dtype)


def onehot_gather_rows(points: jax.Array, idx_flat: jax.Array) -> jax.Array:
    """Row gather (B,n,C) by (B,K) -> (B,K,C) as a one-hot contraction.

    Written as a plain einsum so XLA picks its fastest TPU strategy for the
    shape (a native gather at small n, an MXU one-hot matmul at large n) —
    measured 2-10x faster than both take_along_axis and hand-tiled Pallas
    one-hot kernels at PointNet++ shapes. Exact for f32 (HIGHEST) and bf16.
    """
    n = points.shape[1]
    oh = jax.nn.one_hot(idx_flat, n, dtype=points.dtype)
    return jnp.einsum("bkn,bnc->bkc", oh, points,
                      precision=_exact_gather_precision(points.dtype))


def onehot_scatter_rows(g_flat: jax.Array, idx_flat: jax.Array,
                        n: int) -> jax.Array:
    """Deterministic scatter-add (B,K,C) by (B,K) -> (B,n,C): the transpose
    one-hot contraction, accumulating in f32 (no atomics, fixed order)."""
    oh = jax.nn.one_hot(idx_flat, n, dtype=g_flat.dtype)
    out = jnp.einsum("bkn,bkc->bnc", oh, g_flat,
                     precision=_exact_gather_precision(g_flat.dtype),
                     preferred_element_type=jnp.float32)
    return out.astype(g_flat.dtype)


@jax.custom_vjp
def _group_point_mxu(points: jax.Array, idx: jax.Array) -> jax.Array:
    B, m, s = idx.shape
    out = onehot_gather_rows(points, idx.reshape(B, m * s))
    return out.reshape(B, m, s, points.shape[-1])


def _gp_mxu_fwd(points, idx):
    return _group_point_mxu(points, idx), (idx, points.shape[1])


def _gp_mxu_bwd(res, g):
    idx, n = res
    B, m, s, C = g.shape
    grad = onehot_scatter_rows(g.reshape(B, m * s, C), idx.reshape(B, m * s), n)
    return grad, None


_group_point_mxu.defvjp(_gp_mxu_fwd, _gp_mxu_bwd)


def group_point(points: jax.Array, idx: jax.Array,
                impl: str | None = None) -> jax.Array:
    """Gather neighbor features: points (B,N,C), idx (B,M,S) -> (B,M,S,C).

    Gradient w.r.t. points is a deterministic scatter-add (replaces the
    atomicAdd kernel at tf_grouping_g.cu:61-78); idx gets none. On TPU both
    directions run as one-hot MXU contractions (the ``mxu`` einsum
    formulation by default — see onehot_gather_rows; Pallas VMEM-tiled
    kernels in ops/pallas/group.py via impl="pallas").
    """
    resolved = config.resolve_gather_impl(impl)
    is_float = jnp.issubdtype(points.dtype, jnp.floating)
    # f32-accumulating one-hot paths are exact only for float payloads
    if resolved == "pallas" and is_float:
        from pointnet2_tpu.ops.pallas.group import group_point_pallas

        return group_point_pallas(points, idx)
    if resolved == "mxu" and is_float:
        return _group_point_mxu(points, idx)
    return _group_point_xla(points, idx)


def _group_point_fwd(points, idx):
    return _group_point_xla(points, idx), (idx, points.shape[1])


def _group_point_bwd(res, g):
    idx, n = res
    B, M, S, C = g.shape
    flat_g = g.reshape(B, M * S, C)
    flat_idx = idx.reshape(B, M * S)
    grad = jnp.zeros((B, n, C), g.dtype)
    grad = grad.at[jnp.arange(B)[:, None], flat_idx].add(flat_g)
    return grad, None


_group_point_xla.defvjp(_group_point_fwd, _group_point_bwd)


@partial(jax.jit, static_argnames=("k",))
def knn_point(k: int, xyz1: jax.Array, xyz2: jax.Array):
    """k nearest neighbors of each query in the dataset.

    xyz1: (B, N, C) dataset; xyz2: (B, M, C) queries.
    Returns (val, idx): (B, M, k) squared distances ascending and indices,
    ties broken by lowest index (parity with the reference's stable
    SelectionSort, tf_grouping_g.cu:100-122).
    """
    d2 = _pairwise_sqdist(xyz2, xyz1)  # (B, M, N)
    neg, idx = jax.lax.top_k(-d2, k)
    return -neg, idx.astype(jnp.int32)
