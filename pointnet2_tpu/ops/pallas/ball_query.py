"""Pallas TPU kernel for fixed-radius ball query.

Design (TPU-first, not a translation of tf_grouping_g.cu:3-36):

The CUDA kernel gives each query point a thread that scans all n dataset
points sequentially. On TPU we tile queries into sublanes and dataset points
into lanes: a (TM, N) squared-distance tile is computed with three
broadcasted VPU ops (exact, no matmul rounding), and the order-dependent
"first nsample hits in scan order" selection is realised as `nsample`
masked min-reductions over the lane axis — each reduction finds the next
hit index strictly greater than the previous one, in lockstep for all TM
queries. The (TM, N) tile lives entirely in VMEM; the (B, M, N) distance
matrix is never materialised in HBM (the XLA fallback materialises it and
pays a top_k sort on top).

Pad-with-first-hit semantics and the in-ball count (capped at nsample)
match tf_grouping_g.cu:14-34 exactly; queries with an empty ball get
index 0 (the reference leaves uninitialised memory there).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pointnet2_tpu import config

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _ball_query_kernel(q_ref, d_ref, idx_ref, cnt_ref, *, r2: float, nsample: int,
                       n_real: int):
    # q_ref: (1, TM, 3) queries; d_ref: (1, 3, Np) dataset (transposed)
    q = q_ref[0]  # (TM, 3)
    qx = q[:, 0:1]
    qy = q[:, 1:2]
    qz = q[:, 2:3]
    x = d_ref[0, 0:1, :]  # (1, Np)
    y = d_ref[0, 1:2, :]
    z = d_ref[0, 2:3, :]
    TM = q.shape[0]
    Np = x.shape[1]

    d2 = jnp.square(qx - x) + jnp.square(qy - y) + jnp.square(qz - z)  # (TM, Np)
    col = jax.lax.broadcasted_iota(jnp.int32, (TM, Np), 1)
    mask = (d2 < r2) & (col < n_real)

    cnt = jnp.minimum(jnp.sum(mask.astype(jnp.int32), axis=1, keepdims=True),
                      nsample)  # (TM, 1)
    slot_col = jax.lax.broadcasted_iota(jnp.int32, (TM, nsample), 1)

    def body(s, carry):
        prev, acc = carry  # (TM, 1) i32, (TM, nsample) i32
        cand = jnp.where(mask & (col > prev), col, Np)
        nxt = jnp.min(cand, axis=1, keepdims=True).astype(jnp.int32)  # Np if exhausted
        hit = nxt < Np
        first = acc[:, 0:1]  # valid for s >= 1; for s == 0 fall back to 0
        pad = jnp.where(s > 0, first, 0)
        val = jnp.where(hit, nxt, pad)
        acc = jnp.where(slot_col == s, val, acc)
        prev = jnp.where(hit, nxt, prev)
        return prev, acc

    init = (jnp.full((TM, 1), -1, jnp.int32), jnp.zeros((TM, nsample), jnp.int32))
    _, acc = jax.lax.fori_loop(0, nsample, body, init)
    idx_ref[0] = acc
    cnt_ref[0] = cnt.astype(jnp.int32)  # (TM, 1) block


@partial(jax.jit, static_argnames=("radius", "nsample"))
def ball_query_pallas(radius: float, nsample: int, xyz1: jax.Array, xyz2: jax.Array):
    """Ball query. xyz1: (B,N,3) dataset, xyz2: (B,M,3) queries.

    Returns (idx (B,M,nsample) int32, pts_cnt (B,M) int32).
    """
    B, N, _ = xyz1.shape
    M = xyz2.shape[1]
    xyz1 = xyz1.astype(jnp.float32)
    xyz2 = xyz2.astype(jnp.float32)

    Np = _round_up(N, _LANE)
    # Budget the (TM, Np) f32 working tiles to stay comfortably in VMEM.
    TM = max(8, min(M, (1 << 17) // Np))
    TM = (TM // 8) * 8 if TM >= 8 else 8
    Mp = _round_up(M, TM)

    xyz1_t = jnp.moveaxis(xyz1, -1, 1)  # (B, 3, N)
    if Np != N:
        # Lane pads replicate point 0 but are masked out by col < n_real.
        pad = jnp.broadcast_to(xyz1_t[:, :, :1], (B, 3, Np - N))
        xyz1_t = jnp.concatenate([xyz1_t, pad], axis=-1)
    if Mp != M:
        padq = jnp.broadcast_to(xyz2[:, :1, :], (B, Mp - M, 3))
        xyz2 = jnp.concatenate([xyz2, padq], axis=1)

    grid = (B, Mp // TM)
    idx, cnt = pl.pallas_call(
        partial(_ball_query_kernel, r2=float(radius) ** 2, nsample=nsample,
                n_real=N),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TM, 3), lambda b, m: (b, m, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, Np), lambda b, m: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TM, nsample), lambda b, m: (b, m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TM, 1), lambda b, m: (b, m, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Mp, nsample), jnp.int32),
            jax.ShapeDtypeStruct((B, Mp, 1), jnp.int32),
        ],
        interpret=config.interpret_mode(),
    )(xyz2, xyz1_t)
    return idx[:, :M], cnt[:, :M, 0]
