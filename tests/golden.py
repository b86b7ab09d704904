"""Numpy golden oracles encoding the reference ops' exact semantics.

These are deliberately naive scan-order implementations written from the
documented semantics of the reference CUDA/C++ kernels (see SURVEY.md §2.1):
- FPS: seed index 0, iterative max-of-min-squared-distance, lowest-index
  tie-break (tf_sampling_g.cu:105-170).
- Ball query: first `nsample` points with d < radius in scan order, all
  slots pre-filled with the first hit, count capped at nsample
  (tf_grouping_g.cu:3-36).
- three_nn: 3 smallest squared distances, stable/lowest-index ties
  (tf_interpolate.cpp:60-103).
"""

import numpy as np


def fps_np(xyz: np.ndarray, npoint: int) -> np.ndarray:
    B, N, _ = xyz.shape
    out = np.zeros((B, npoint), np.int32)
    for b in range(B):
        min_d = np.full(N, 1e38, np.float32)
        last = 0
        for j in range(1, npoint):
            d = np.sum((xyz[b] - xyz[b, last]) ** 2, axis=-1).astype(np.float32)
            min_d = np.minimum(min_d, d)
            last = int(np.argmax(min_d))  # lowest index on ties
            out[b, j] = last
    return out


def ball_query_np(radius: float, nsample: int, xyz1: np.ndarray, xyz2: np.ndarray):
    B, N, _ = xyz1.shape
    M = xyz2.shape[1]
    idx = np.zeros((B, M, nsample), np.int32)
    cnt = np.zeros((B, M), np.int32)
    for b in range(B):
        for j in range(M):
            c = 0
            for k in range(N):
                if c == nsample:
                    break
                d = max(np.sqrt(np.sum((xyz2[b, j] - xyz1[b, k]) ** 2)), 1e-20)
                if d < radius:
                    if c == 0:
                        idx[b, j, :] = k
                    idx[b, j, c] = k
                    c += 1
            cnt[b, j] = c
    return idx, cnt


def three_nn_np(xyz1: np.ndarray, xyz2: np.ndarray):
    B, N, _ = xyz1.shape
    M = xyz2.shape[1]
    # M < 3: missing slots keep init values idx=0 / dist=1e40-class
    # (tf_interpolate.cpp:66-67); inf mirrors ops.three_nn
    dist = np.full((B, N, 3), np.inf, np.float32)
    idx = np.zeros((B, N, 3), np.int32)
    m = min(3, xyz2.shape[1])
    for b in range(B):
        d2 = np.sum((xyz1[b][:, None, :] - xyz2[b][None, :, :]) ** 2, axis=-1)
        order = np.argsort(d2, axis=1, kind="stable")[:, :m]
        idx[b, :, :m] = order
        dist[b, :, :m] = np.take_along_axis(d2, order, axis=1)
    return dist, idx


def knn_np(k: int, xyz1: np.ndarray, xyz2: np.ndarray):
    B = xyz1.shape[0]
    M = xyz2.shape[1]
    # fewer dataset points than k: missing slots keep idx=0 / dist=inf
    val = np.full((B, M, k), np.inf, np.float32)
    idx = np.zeros((B, M, k), np.int32)
    kk = min(k, xyz1.shape[1])
    for b in range(B):
        d2 = np.sum((xyz2[b][:, None, :] - xyz1[b][None, :, :]) ** 2, axis=-1)
        order = np.argsort(d2, axis=1, kind="stable")[:, :kk]
        idx[b, :, :kk] = order
        val[b, :, :kk] = np.take_along_axis(d2, order, axis=1)
    return val, idx


def shared_mlp_np(variables: dict, x: np.ndarray, eps: float = 1e-3):
    """Eval-mode SharedMLP: Dense + BatchNorm(running stats) + ReLU per
    layer, mirroring tf_util.conv2d with bn=True (utils/tf_util.py:120-185,
    batch_norm_template :512-531) on a (..., C) array."""
    params, stats = variables["params"], variables["batch_stats"]
    for i in range(len(params)):
        p, s = params[f"conv{i}"], stats[f"conv{i}"]
        x = x @ np.asarray(p["dense"]["kernel"]) + np.asarray(p["dense"]["bias"])
        mean = np.asarray(s["norm"]["mean"])
        var = np.asarray(s["norm"]["var"])
        x = (x - mean) / np.sqrt(var + eps)
        x = x * np.asarray(p["norm"]["scale"]) + np.asarray(p["norm"]["bias"])
        x = np.maximum(x, 0.0)
    return x


def sa_module_np(variables: dict, xyz: np.ndarray, points,
                 npoint, radius, nsample, group_all: bool = False,
                 pooling: str = "max", knn: bool = False,
                 use_xyz: bool = True, has_mlp2: bool = False):
    """Eval-mode numpy golden of pointnet_sa_module
    (utils/pointnet_util.py:87-154): sample_and_group(_all) -> shared MLP ->
    pooling {max, avg, weighted_avg, max_and_avg} -> optional mlp2.

    `variables` are the flax SetAbstraction variables; the dense/BN params
    are read out of the mlp_mod / mlp2_mod scopes."""
    B, N, _ = xyz.shape
    if group_all:
        # sample_and_group_all (utils/pointnet_util.py:59-84)
        new_xyz = np.zeros((B, 1, 3), np.float32)
        grouped_xyz = xyz[:, None, :, :]
        if points is not None:
            feats = np.concatenate([xyz, points], axis=-1) if use_xyz else points
            new_points = feats[:, None, :, :]
        else:
            new_points = grouped_xyz
    else:
        # sample_and_group (utils/pointnet_util.py:22-56)
        fidx = fps_np(xyz, npoint)
        new_xyz = np.take_along_axis(xyz, fidx[..., None], axis=1)
        if knn:
            _, idx = knn_np(nsample, xyz, new_xyz)
        else:
            idx, _ = ball_query_np(radius, nsample, xyz, new_xyz)
        gather = lambda a: np.stack([a[b][idx[b]] for b in range(B)])
        grouped_xyz = gather(xyz) - new_xyz[:, :, None, :]
        if points is not None:
            grouped_points = gather(points)
            new_points = (np.concatenate([grouped_xyz, grouped_points], -1)
                          if use_xyz else grouped_points)
        else:
            new_points = grouped_xyz
    mlp_vars = {"params": variables["params"]["mlp_mod"],
                "batch_stats": variables["batch_stats"]["mlp_mod"]}
    new_points = shared_mlp_np(mlp_vars, new_points)
    # pooling (utils/pointnet_util.py:126-140)
    if pooling == "max":
        pooled = new_points.max(axis=2)
    elif pooling == "avg":
        pooled = new_points.mean(axis=2)
    elif pooling == "weighted_avg":
        dists = np.linalg.norm(grouped_xyz, axis=-1, keepdims=True)
        exp_dists = np.exp(-dists * 5)
        weights = exp_dists / exp_dists.sum(axis=2, keepdims=True)
        pooled = (new_points * weights).sum(axis=2)
    elif pooling == "max_and_avg":
        pooled = np.concatenate(
            [new_points.mean(axis=2), new_points.max(axis=2)], axis=-1)
    else:
        raise ValueError(pooling)
    if has_mlp2:
        mlp2_vars = {"params": variables["params"]["mlp2_mod"],
                     "batch_stats": variables["batch_stats"]["mlp2_mod"]}
        pooled = shared_mlp_np(mlp2_vars, pooled)
    return new_xyz, pooled
