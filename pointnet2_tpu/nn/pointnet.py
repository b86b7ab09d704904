"""PointNet++ set-abstraction and feature-propagation modules.

Functional Flax re-design of the reference layer library
(utils/pointnet_util.py:22-229) with full option parity: SSG/MSG grouping,
group_all, pooling modes {max, avg, weighted_avg, max_and_avg}, knn vs ball
query, use_xyz, and the optional post-pooling mlp2 stack.

All shapes are static and padded ((B, npoint, nsample, C) neighbor tensors,
pad-with-first-hit), so every per-point MLP is one large MXU matmul and the
whole network jit-compiles once.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from pointnet2_tpu.nn.layers import SharedMLP
from pointnet2_tpu.ops import (
    max_pool,
    farthest_point_sample,
    gather_point,
    group_point,
    knn_point,
    query_ball_and_group_xyz,
    query_ball_point,
    three_interpolate,
    three_nn,
)


def sample_and_group(npoint, radius, nsample, xyz, points, knn=False,
                     use_xyz=True, dtype=None):
    """FPS -> gather -> (ball query | kNN) -> group -> center-subtract.

    Mirrors utils/pointnet_util.py:22-56.

    With `dtype` (e.g. bfloat16), the *gathered values* are cast before
    grouping — on TPU a bf16 one-hot gather is both exact and ~3x faster —
    while all geometry (FPS, ball query, returned new_xyz) stays f32.

    Returns (new_xyz (B,npoint,3), new_points (B,npoint,nsample,3+C),
    idx (B,npoint,nsample), grouped_xyz (B,npoint,nsample,3)).
    """
    new_xyz = gather_point(xyz, farthest_point_sample(xyz, npoint))
    cxyz = xyz.astype(dtype) if dtype is not None else xyz
    center = new_xyz[:, :, None, :].astype(cxyz.dtype)
    if knn:
        _, idx = knn_point(nsample, xyz, new_xyz)
        grouped_xyz = group_point(cxyz, idx) - center
    else:
        # Fused ball-query + coordinate-gather kernel: the selection mask
        # computed during the query extracts the neighbor xyz in the same
        # VMEM pass (no second one-hot gather).
        idx, _, raw = query_ball_and_group_xyz(radius, nsample, xyz, new_xyz)
        grouped_xyz = raw.astype(cxyz.dtype) - center
    if points is not None:
        cpoints = points.astype(dtype) if dtype is not None else points
        grouped_points = group_point(cpoints, idx)
        if use_xyz:
            new_points = jnp.concatenate([grouped_xyz, grouped_points],
                                         axis=-1)
        else:
            new_points = grouped_points
    else:
        new_points = grouped_xyz
    return new_xyz, new_points, idx, grouped_xyz


def sample_and_group_all(xyz, points, use_xyz=True):
    """Single global group at the origin (utils/pointnet_util.py:59-84)."""
    B, N, _ = xyz.shape
    new_xyz = jnp.zeros((B, 1, 3), xyz.dtype)
    idx = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None, None, :], (B, 1, N))
    grouped_xyz = xyz[:, None, :, :]
    if points is not None:
        if use_xyz:
            new_points = jnp.concatenate([xyz, points], axis=2)
        else:
            new_points = points
        new_points = new_points[:, None, :, :]
    else:
        new_points = grouped_xyz
    return new_xyz, new_points, idx, grouped_xyz


def _pool(new_points, grouped_xyz, pooling: str):
    """Local-region pooling over the nsample axis
    (utils/pointnet_util.py:126-140). new_points: (B, np, ns, C)."""
    if pooling == "max":
        return max_pool(new_points, 2)
    if pooling == "avg":
        return jnp.mean(new_points, axis=2)
    if pooling == "weighted_avg":
        dists = jnp.linalg.norm(grouped_xyz, axis=-1, keepdims=True)
        exp_dists = jnp.exp(-dists * 5)
        weights = exp_dists / jnp.sum(exp_dists, axis=2, keepdims=True)
        return jnp.sum(new_points * weights, axis=2)
    if pooling == "max_and_avg":
        return jnp.concatenate(
            [jnp.mean(new_points, axis=2), max_pool(new_points, 2)], axis=-1)
    raise ValueError(f"unknown pooling {pooling!r}")


def _lifted_center_term(mlp_mod, new_xyz, feat_width: int, xyz_first: bool,
                        dtype):
    """W_xyz^T · new_xyz for the lifted first dense, without touching the
    kernel params directly: Dense([c, 0]) - Dense([0, 0]) == c @ W_xyz
    (the bias cancels; the zero blocks constant-fold in XLA).

    feat_width: channel count of the non-xyz part of the dense input;
    xyz_first: whether xyz occupies the leading 3 input channels."""
    B, M, _ = new_xyz.shape
    c = new_xyz.astype(dtype)
    if feat_width:
        zeros = jnp.zeros((B, M, feat_width), dtype)
        parts = [c, zeros] if xyz_first else [zeros, c]
        csrc = jnp.concatenate(parts, axis=-1)
    else:
        csrc = c
    return mlp_mod.lift_first(csrc) - mlp_mod.lift_first(jnp.zeros_like(csrc))


class SetAbstraction(nn.Module):
    """PointNet++ SA module (single-scale or group-all).

    Mirrors pointnet_sa_module (utils/pointnet_util.py:87-154).
    __call__(xyz (B,N,3), points (B,N,C)|None) ->
      (new_xyz (B,np,3), new_points (B,np,C'), idx (B,np,ns)).

    TPU-first layout (``fuse_first=True``, the default): the first MLP
    layer's dense is linear, so it commutes with the neighbor gather and
    the center subtraction —

        Dense(concat[gather(xyz) - c, gather(pts)])
          == gather(Dense(concat[xyz, pts])) - c @ W_xyz

    The dense therefore runs on the N un-gathered points (16-32x fewer rows
    than npoint*nsample), the gather moves mlp[0]-wide rows (a single
    MXU-friendly one-hot contraction instead of a narrow C=3 pass plus a
    feature pass), and only BN+ReLU touch the grouped tensor. Numerics
    differ from the reference layout only by float reassociation.
    ``weighted_avg`` pooling needs the raw grouped offsets, so it uses the
    unfused path.
    """

    npoint: int | None
    radius: float | None
    nsample: int | None
    mlp: Sequence[int]
    mlp2: Sequence[int] | None = None
    group_all: bool = False
    bn: bool = True
    pooling: str = "max"
    knn: bool = False
    use_xyz: bool = True
    dtype: Any = None
    fuse_first: bool = True

    def setup(self):
        self.mlp_mod = SharedMLP(self.mlp, bn=self.bn, dtype=self.dtype)
        if self.mlp2:
            self.mlp2_mod = SharedMLP(self.mlp2, bn=self.bn, dtype=self.dtype)

    def _fused_forward(self, xyz, points, train, bn_momentum):
        """Sample/group with the first dense lifted through the gather."""
        new_xyz = gather_point(xyz, farthest_point_sample(xyz, self.npoint))
        if self.knn:
            _, idx = knn_point(self.nsample, xyz, new_xyz)
        else:
            idx, _ = query_ball_point(self.radius, self.nsample, xyz, new_xyz)

        dt = self.dtype or xyz.dtype
        cxyz = xyz.astype(dt)
        if points is None:
            src = cxyz
        elif self.use_xyz:
            src = jnp.concatenate([cxyz, points.astype(dt)], axis=-1)
        else:
            src = points.astype(dt)
        lifted = self.mlp_mod.lift_first(src)  # (B, N, mlp[0])
        grouped = group_point(lifted, idx)  # (B, np, ns, mlp[0])
        if points is None or self.use_xyz:
            feat_width = 0 if points is None else points.shape[-1]
            cw = _lifted_center_term(self.mlp_mod, new_xyz, feat_width,
                                     xyz_first=True, dtype=dt)
            grouped = grouped - cw[:, :, None, :]
        if (self.pooling == "max"
                and self.mlp_mod.fused_tail_supported(grouped, pool=True)):
            # single fused Pallas chain: BN+ReLU+dense stack + max-pool,
            # with the widest activation never leaving VMEM
            pooled = self.mlp_mod.fused_tail(grouped, train, bn_momentum)
            return new_xyz, pooled, idx, True
        if self.pooling == "max" and self.mlp_mod.pooled_max_supported():
            # pool commuted before the last BN affine: the widest tensor
            # skips its normalize+ReLU pass (ConvBN.post_pooled_max)
            pooled = self.mlp_mod.finish_first_pooled(grouped, train,
                                                      bn_momentum, axis=2)
            return new_xyz, pooled, idx, True
        new_points = self.mlp_mod.finish_first(grouped, train, bn_momentum)
        return new_xyz, new_points, idx, False

    def __call__(self, xyz, points, train: bool = False,
                 bn_momentum: jax.Array | float = 0.9):
        fused = (self.fuse_first and not self.group_all
                 and self.pooling != "weighted_avg")
        if fused:
            new_xyz, new_points, idx, pooled = self._fused_forward(
                xyz, points, train, bn_momentum)
            if not pooled:
                new_points = _pool(new_points, None, self.pooling)
        else:
            if self.group_all:
                new_xyz, new_points, idx, grouped_xyz = sample_and_group_all(
                    xyz, points, self.use_xyz)
            else:
                new_xyz, new_points, idx, grouped_xyz = sample_and_group(
                    self.npoint, self.radius, self.nsample, xyz, points,
                    self.knn, self.use_xyz, dtype=self.dtype)
            if self.dtype is not None:
                new_points = new_points.astype(self.dtype)
            if self.pooling == "max" and self.mlp_mod.pooled_max_supported():
                new_points = self.mlp_mod.call_pooled(new_points, train,
                                                      bn_momentum, axis=2)
            else:
                new_points = self.mlp_mod(new_points, train, bn_momentum)
                new_points = _pool(new_points, grouped_xyz, self.pooling)
        if self.mlp2:
            new_points = self.mlp2_mod(new_points, train, bn_momentum)
        return new_xyz, new_points, idx


class SetAbstractionMSG(nn.Module):
    """PointNet++ SA module with multi-scale grouping.

    Mirrors pointnet_sa_module_msg (utils/pointnet_util.py:156-196): one FPS,
    then per-radius ball query + grouping + MLP + max-pool, concatenated.
    Note the reference concatenates [features, xyz] here (features first),
    the opposite order of single-scale sample_and_group — kept for parity.
    """

    npoint: int
    radius_list: Sequence[float]
    nsample_list: Sequence[int]
    mlp_list: Sequence[Sequence[int]]
    bn: bool = True
    use_xyz: bool = True
    dtype: Any = None
    fuse_first: bool = True

    def setup(self):
        # list attribute -> flax scopes mlp_mods_0, mlp_mods_1, ...
        self.mlp_mods = [
            SharedMLP(mlp, bn=self.bn, dtype=self.dtype)
            for mlp in self.mlp_list
        ]

    def __call__(self, xyz, points, train: bool = False,
                 bn_momentum: jax.Array | float = 0.9):
        new_xyz = gather_point(xyz, farthest_point_sample(xyz, self.npoint))
        dt = (self.dtype or xyz.dtype)
        cxyz = xyz.astype(dt)
        cpoints = points.astype(dt) if points is not None else None
        outs = []
        if self.fuse_first:
            # One lifted source per scale (each scale has its own dense);
            # concat order is [features, xyz] — the reverse of single-scale
            # sample_and_group — matching utils/pointnet_util.py:179-183.
            if cpoints is None:
                src = cxyz
            elif self.use_xyz:
                src = jnp.concatenate([cpoints, cxyz], axis=-1)
            else:
                src = cpoints
            feat_width = 0 if cpoints is None else cpoints.shape[-1]
            center_needed = cpoints is None or self.use_xyz
            # Per-radius ball queries, NOT the fused multi-radius kernel
            # (ops.query_ball_point_multi): fusing the distance tile was
            # measured slightly SLOWER end to end (benchmarks/
            # probe_ballq_multi.py, docs/PERF.md negative result) — the
            # shared tile is ~2-8% of the kernel's work (slot extraction
            # costs ~2*nsample VPU ops/lane vs ~8 for the tile) and the
            # fused variant holds more live VMEM per grid step.
            for mlp_mod, radius, nsample in zip(
                    self.mlp_mods, self.radius_list, self.nsample_list):
                idx, _ = query_ball_point(radius, nsample, xyz, new_xyz)
                grouped = group_point(mlp_mod.lift_first(src), idx)
                if center_needed:
                    cw = _lifted_center_term(mlp_mod, new_xyz, feat_width,
                                             xyz_first=False, dtype=dt)
                    grouped = grouped - cw[:, :, None, :]
                if mlp_mod.fused_tail_supported(grouped, pool=True):
                    outs.append(mlp_mod.fused_tail(grouped, train,
                                                   bn_momentum))
                elif mlp_mod.pooled_max_supported():
                    outs.append(mlp_mod.finish_first_pooled(
                        grouped, train, bn_momentum, axis=2))
                else:
                    grouped = mlp_mod.finish_first(grouped, train,
                                                   bn_momentum)
                    outs.append(max_pool(grouped, 2))
            return new_xyz, jnp.concatenate(outs, axis=-1)

        center = new_xyz[:, :, None, :].astype(dt)
        for mlp_mod, radius, nsample in zip(
                self.mlp_mods, self.radius_list, self.nsample_list):
            # fused ball-query + coordinate-gather per scale
            idx, _, raw = query_ball_and_group_xyz(radius, nsample, xyz,
                                                   new_xyz)
            grouped_xyz = raw.astype(dt) - center
            if points is not None:
                grouped = group_point(cpoints, idx)
                if self.use_xyz:
                    grouped = jnp.concatenate([grouped, grouped_xyz], axis=-1)
            else:
                grouped = grouped_xyz
            if mlp_mod.pooled_max_supported():
                outs.append(mlp_mod.call_pooled(grouped, train, bn_momentum,
                                                axis=2))
            else:
                grouped = mlp_mod(grouped, train, bn_momentum)
                outs.append(max_pool(grouped, 2))
        return new_xyz, jnp.concatenate(outs, axis=-1)


class FeaturePropagation(nn.Module):
    """PointNet++ FP module: inverse-distance 3-NN upsampling + skip + MLP.

    Mirrors pointnet_fp_module (utils/pointnet_util.py:199-229). The
    reference's three_nn/three_interpolate are CPU-only custom ops (every FP
    layer round-trips device->host); here they are on-device XLA.
    Distances are stop_gradient'ed: the reference defines no gradient for
    the interpolation weights (tf_interpolate.py:29-34).

    TPU-first layout (``fuse_first=True``, the default): the first MLP
    dense is linear and the interpolation weights sum to 1, so the dense
    commutes with the interpolation *exactly* (the bias rides through the
    affine combination):

        Dense(concat[interp(p2), p1])
          == interp(Dense_2(p2) + b) + Dense_1(p1)

    The p2 half of the dense therefore runs on the M sparse points (4-8x
    fewer rows than the N dense points), and the pre-dense interpolated
    tensor plus the (N, C1+C2) concat never materialize — only mlp[0]-wide
    rows move at N. Numerics differ from the reference layout only by
    float reassociation.
    """

    mlp: Sequence[int]
    bn: bool = True
    dtype: Any = None
    fuse_first: bool = True

    def setup(self):
        self.mlp_mod = SharedMLP(self.mlp, bn=self.bn, dtype=self.dtype,
                                 name="mlp")

    def __call__(self, xyz1, xyz2, points1, points2, train: bool = False,
                 bn_momentum: jax.Array | float = 0.9):
        dist, idx = three_nn(xyz1, xyz2)
        dist = jax.lax.stop_gradient(jnp.maximum(dist, 1e-10))
        inv = 1.0 / dist
        weight = inv / jnp.sum(inv, axis=2, keepdims=True)
        if self.fuse_first:
            dt = self.dtype or points2.dtype
            p2 = points2.astype(dt)
            if points1 is not None:
                p1 = points1.astype(dt)
                (B, M, C2), N, C1 = p2.shape, p1.shape[1], p1.shape[-1]
                # Split the first dense around the concat: kernel rows
                # [0:C2] act on the interpolated features, rows [C2:] on
                # the skip. The zero blocks constant-fold in XLA (the
                # _lifted_center_term pattern), and the bias (in lifted2)
                # is counted exactly once.
                lifted2 = self.mlp_mod.lift_first(
                    jnp.concatenate([p2, jnp.zeros((B, M, C1), dt)], -1))
                z = jnp.concatenate([jnp.zeros((B, N, C2), dt), p1], -1)
                lifted1 = (self.mlp_mod.lift_first(z)
                           - self.mlp_mod.lift_first(jnp.zeros_like(z)))
                pre = (three_interpolate(lifted2, idx, weight).astype(dt)
                       + lifted1)
            else:
                lifted2 = self.mlp_mod.lift_first(p2)
                pre = three_interpolate(lifted2, idx, weight).astype(dt)
            return self.mlp_mod.finish_first(pre, train, bn_momentum)
        interpolated = three_interpolate(points2, idx, weight)
        if points1 is not None:
            new_points = jnp.concatenate([interpolated, points1], axis=2)
        else:
            new_points = interpolated
        if self.dtype is not None:
            new_points = new_points.astype(self.dtype)
        return self.mlp_mod(new_points, train, bn_momentum)
