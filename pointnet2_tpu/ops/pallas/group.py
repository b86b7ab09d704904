"""Pallas MXU-based neighbor gather/scatter (group_point and its gradient).

XLA's generic gather on TPU runs far below HBM bandwidth for the
(B, n, C)-by-(B, m, nsample) row-gather shape of PointNet++ grouping
(~80 GB/s measured). TPU-native redesign: a gather of rows is a matmul with
a one-hot matrix, and the MXU has enormous headroom — so each kernel tile
builds its one-hot block *in VMEM* (iota compare against the index block;
it never touches HBM) and contracts it with a points tile:

  forward:  out[k, :]  = onehot(idx)[k, n] @ points[n, :]    (TK, n)x(n, C)
  backward: dpoints[n] = onehot(idx)[k, n]^T @ dout[k, :]    (TN, K)x(K, C)

The backward pass doubles as the deterministic scatter-add that replaces
the reference's atomicAdd grad kernels (tf_grouping_g.cu:61-78,
tf_sampling_g.cu:183-192): one-hot contraction accumulates duplicate
indices exactly, with a fixed reduction order.

Both directions tile the contraction dimension and accumulate in the
revisited output block, so arbitrary n / K fit in VMEM.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pointnet2_tpu import config
from pointnet2_tpu.ops.pallas.util import (
    LANE as _LANE,
    exact_copy_precision as _exact_precision,
    round_up as _round_up,
)


def _gather_kernel(idx_ref, pts_ref, out_ref, *, nchunk_size: int):
    nc = pl.program_id(2)
    ids = idx_ref[0]  # (TK, 1) int32
    col = jax.lax.broadcasted_iota(jnp.int32, (ids.shape[0], nchunk_size), 1)
    col = col + nc * nchunk_size
    onehot = (ids == col).astype(pts_ref.dtype)  # (TK, NCHUNK)
    part = jnp.dot(onehot, pts_ref[0], preferred_element_type=jnp.float32,
                   precision=_exact_precision(pts_ref.dtype))

    @pl.when(nc == 0)
    def _():
        out_ref[0] = part.astype(out_ref.dtype)

    @pl.when(nc > 0)
    def _():
        out_ref[0] = out_ref[0] + part.astype(out_ref.dtype)


def _scatter_kernel(idx_ref, g_ref, out_ref, *, ntile_size: int):
    kc = pl.program_id(2)
    nt = pl.program_id(1)
    ids = idx_ref[0]  # (1, TKC) int32
    rows = jax.lax.broadcasted_iota(jnp.int32, (ntile_size, ids.shape[1]), 0)
    rows = rows + nt * ntile_size
    onehot_t = (rows == ids).astype(g_ref.dtype)  # (TN, TKC)
    part = jnp.dot(onehot_t, g_ref[0], preferred_element_type=jnp.float32,
                   precision=_exact_precision(g_ref.dtype))

    @pl.when(kc == 0)
    def _():
        out_ref[0] = part.astype(out_ref.dtype)

    @pl.when(kc > 0)
    def _():
        out_ref[0] = out_ref[0] + part.astype(out_ref.dtype)


def _gather_kernel_t(idx_ref, pts_ref, out_ref, *, nchunk_size: int):
    """Transposed gather for small C: K in lanes, channels in sublanes."""
    nc = pl.program_id(2)
    ids = idx_ref[0]  # (1, TK) int32
    rows = jax.lax.broadcasted_iota(jnp.int32, (nchunk_size, ids.shape[1]), 0)
    rows = rows + nc * nchunk_size
    onehot = (rows == ids).astype(pts_ref.dtype)  # (NCHUNK, TK)
    part = jnp.dot(pts_ref[0], onehot, preferred_element_type=jnp.float32,
                   precision=_exact_precision(pts_ref.dtype))  # (C, TK)

    @pl.when(nc == 0)
    def _():
        out_ref[0] = part.astype(out_ref.dtype)

    @pl.when(nc > 0)
    def _():
        out_ref[0] = out_ref[0] + part.astype(out_ref.dtype)


def _scatter_kernel_t(idx_ref, g_ref, out_ref, *, ntile_size: int):
    """Transposed scatter for small C: n in lanes, channels in sublanes."""
    kc = pl.program_id(2)
    nt = pl.program_id(1)
    ids = idx_ref[0]  # (TKC, 1) int32
    cols = jax.lax.broadcasted_iota(jnp.int32, (ids.shape[0], ntile_size), 1)
    cols = cols + nt * ntile_size
    onehot = (ids == cols).astype(g_ref.dtype)  # (TKC, TN)
    part = jnp.dot(g_ref[0], onehot, preferred_element_type=jnp.float32,
                   precision=_exact_precision(g_ref.dtype))  # (C, TN)

    @pl.when(kc == 0)
    def _():
        out_ref[0] = part.astype(out_ref.dtype)

    @pl.when(kc > 0)
    def _():
        out_ref[0] = out_ref[0] + part.astype(out_ref.dtype)


# below this channel count the row-major kernels would waste most MXU lanes
# on channel padding; the transposed layout keeps lanes full of gather rows
_SMALL_C = 16


def _gather_rows_t(points: jax.Array, idx_flat: jax.Array) -> jax.Array:
    """Small-C gather: contract (C, n) x onehot(n, K) -> (C, K)."""
    B, n, C = points.shape
    K = idx_flat.shape[1]
    TK = 1024 if K >= 1024 else 512
    Kp = _round_up(K, TK)
    NCHUNK = min(_round_up(n, _LANE), 1024)
    Np = _round_up(n, NCHUNK)
    pts_t = jnp.moveaxis(points, -1, 1)  # (B, C, n)
    if Np != n:
        pts_t = jnp.pad(pts_t, ((0, 0), (0, 0), (0, Np - n)))
    if Kp != K:
        idx_flat = jnp.pad(idx_flat, ((0, 0), (0, Kp - K)),
                           constant_values=Np)
    idx3 = idx_flat[:, None, :].astype(jnp.int32)  # (B, 1, Kp)

    grid = (B, Kp // TK, Np // NCHUNK)
    out = pl.pallas_call(
        partial(_gather_kernel_t, nchunk_size=NCHUNK),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, TK), lambda b, k, nc: (b, 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, NCHUNK), lambda b, k, nc: (b, 0, nc),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, TK), lambda b, k, nc: (b, 0, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, Kp), points.dtype),
        interpret=config.interpret_mode(),
    )(idx3, pts_t)
    return jnp.moveaxis(out[:, :, :K], 1, -1)  # (B, K, C)


def _scatter_rows_t(g_flat: jax.Array, idx_flat: jax.Array, n: int) -> jax.Array:
    """Small-C scatter-add: (C, K) x onehot(K, n) -> (C, n)."""
    B, K, C = g_flat.shape
    TN = 512
    Np = _round_up(n, TN)
    TKC = min(_round_up(K, 8), 1024)
    Kp = _round_up(K, TKC)
    g_t = jnp.moveaxis(g_flat, -1, 1)  # (B, C, K)
    if Kp != K:
        g_t = jnp.pad(g_t, ((0, 0), (0, 0), (0, Kp - K)))
        idx_flat = jnp.pad(idx_flat, ((0, 0), (0, Kp - K)),
                           constant_values=Np)
    idx3 = idx_flat[..., None].astype(jnp.int32)  # (B, Kp, 1)

    grid = (B, Np // TN, Kp // TKC)
    out = pl.pallas_call(
        partial(_scatter_kernel_t, ntile_size=TN),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TKC, 1), lambda b, nt, kc: (b, kc, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, TKC), lambda b, nt, kc: (b, 0, kc),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, TN), lambda b, nt, kc: (b, 0, nt),
                               memory_space=pltpu.VMEM),
        # accumulate cross-chunk partial sums in f32: a bf16 running sum
        # swamps small contributions to hot rows once it is ~256x larger
        out_shape=jax.ShapeDtypeStruct((B, C, Np), jnp.float32),
        interpret=config.interpret_mode(),
    )(idx3, g_t)
    out = out.astype(g_flat.dtype)
    return jnp.moveaxis(out[:, :, :n], 1, -1)  # (B, n, C)


def _gather_rows(points: jax.Array, idx_flat: jax.Array) -> jax.Array:
    """points (B, n, C), idx_flat (B, K) -> (B, K, C) via MXU one-hot."""
    B, n, C = points.shape
    if C <= _SMALL_C:
        return _gather_rows_t(points, idx_flat)
    K = idx_flat.shape[1]
    TK = 256
    Kp = _round_up(K, TK)
    # chunk n so the points block stays comfortably in VMEM
    NCHUNK = min(_round_up(n, _LANE), max(_LANE, (1 << 21) // max(C * 4, 1)
                                          // _LANE * _LANE))
    Np = _round_up(n, NCHUNK)
    if Np != n:
        points = jnp.pad(points, ((0, 0), (0, Np - n), (0, 0)))
    # pad keys with Np (matches no column => contributes zero)
    if Kp != K:
        idx_flat = jnp.pad(idx_flat, ((0, 0), (0, Kp - K)),
                           constant_values=Np)
    idx3 = idx_flat[..., None].astype(jnp.int32)  # (B, Kp, 1)

    grid = (B, Kp // TK, Np // NCHUNK)
    out = pl.pallas_call(
        partial(_gather_kernel, nchunk_size=NCHUNK),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TK, 1), lambda b, k, nc: (b, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NCHUNK, C), lambda b, k, nc: (b, nc, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TK, C), lambda b, k, nc: (b, k, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Kp, C), points.dtype),
        interpret=config.interpret_mode(),
    )(idx3, points)
    return out[:, :K]


def _scatter_rows(g_flat: jax.Array, idx_flat: jax.Array, n: int) -> jax.Array:
    """g_flat (B, K, C), idx_flat (B, K) -> (B, n, C) scatter-add."""
    B, K, C = g_flat.shape
    if C <= _SMALL_C:
        return _scatter_rows_t(g_flat, idx_flat, n)
    TN = 256
    Np = _round_up(n, TN)
    TKC = min(_round_up(K, _LANE), 512)
    Kp = _round_up(K, TKC)
    if Kp != K:
        g_flat = jnp.pad(g_flat, ((0, 0), (0, Kp - K), (0, 0)))
        idx_flat = jnp.pad(idx_flat, ((0, 0), (0, Kp - K)),
                           constant_values=Np)
    idx3 = idx_flat[:, None, :].astype(jnp.int32)  # (B, 1, Kp)

    grid = (B, Np // TN, Kp // TKC)
    out = pl.pallas_call(
        partial(_scatter_kernel, ntile_size=TN),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, TKC), lambda b, nt, kc: (b, 0, kc),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TKC, C), lambda b, nt, kc: (b, kc, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TN, C), lambda b, nt, kc: (b, nt, 0),
                               memory_space=pltpu.VMEM),
        # f32 accumulator across key chunks (see _scatter_rows_t)
        out_shape=jax.ShapeDtypeStruct((B, Np, C), jnp.float32),
        interpret=config.interpret_mode(),
    )(idx3, g_flat)
    return out[:, :n].astype(g_flat.dtype)


@jax.custom_vjp
def group_point_pallas(points: jax.Array, idx: jax.Array) -> jax.Array:
    """points (B, n, C), idx (B, m, s) int32 -> (B, m, s, C)."""
    B, m, s = idx.shape
    out = _gather_rows(points, idx.reshape(B, m * s))
    return out.reshape(B, m, s, points.shape[-1])


def _gp_fwd(points, idx):
    return group_point_pallas(points, idx), (idx, points.shape[1])


def _gp_bwd(res, g):
    idx, n = res
    B, m, s, C = g.shape
    grad = _scatter_rows(g.reshape(B, m * s, C), idx.reshape(B, m * s), n)
    return grad, None


group_point_pallas.defvjp(_gp_fwd, _gp_bwd)


@jax.custom_vjp
def gather_point_pallas(points: jax.Array, idx: jax.Array) -> jax.Array:
    """points (B, n, C), idx (B, m) int32 -> (B, m, C)."""
    return _gather_rows(points, idx)


def _gap_fwd(points, idx):
    return gather_point_pallas(points, idx), (idx, points.shape[1])


def _gap_bwd(res, g):
    idx, n = res
    return _scatter_rows(g, idx, n), None


gather_point_pallas.defvjp(_gap_fwd, _gap_bwd)
