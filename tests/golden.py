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
    dist = np.zeros((B, N, 3), np.float32)
    idx = np.zeros((B, N, 3), np.int32)
    for b in range(B):
        d2 = np.sum((xyz1[b][:, None, :] - xyz2[b][None, :, :]) ** 2, axis=-1)
        order = np.argsort(d2, axis=1, kind="stable")[:, :3]
        idx[b] = order
        dist[b] = np.take_along_axis(d2, order, axis=1)
    return dist, idx


def knn_np(k: int, xyz1: np.ndarray, xyz2: np.ndarray):
    B = xyz1.shape[0]
    M = xyz2.shape[1]
    val = np.zeros((B, M, k), np.float32)
    idx = np.zeros((B, M, k), np.int32)
    for b in range(B):
        d2 = np.sum((xyz2[b][:, None, :] - xyz1[b][None, :, :]) ** 2, axis=-1)
        order = np.argsort(d2, axis=1, kind="stable")[:, :k]
        idx[b] = order
        val[b] = np.take_along_axis(d2, order, axis=1)
    return val, idx
