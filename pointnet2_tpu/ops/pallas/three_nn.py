"""Pallas TPU kernel for 3-nearest-neighbor search.

TPU-first design (not a translation of tf_interpolate.cpp:60-103, which is
a per-point CPU loop): unknown points tile into sublanes, known points into
lanes; a (TN, Mp) squared-distance tile is built with broadcasted VPU ops
and reduced three times by a masked min/lowest-index-argmin — the selected
lane is knocked out with +inf between passes, so duplicate distances yield
distinct neighbors exactly like the reference's insertion update.

The win over the XLA formulation (ops/interpolate.three_nn) is memory: XLA
materialises the (B, N, M) distance matrix in HBM (537 MB at the sem-seg
FP4 shape) and re-reads it for every argmin pass (~3 ms); here the tile
never leaves VMEM and only the (B, N, 3) results reach HBM.

Semantics parity (golden-tested against tests/golden.three_nn_np):
squared distances, ascending, lowest-index tie-break; fewer than 3 known
points leaves missing slots at dist=+inf / idx=0 (tf_interpolate.cpp:66-67
leaves dist=1e40 / idx=0).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pointnet2_tpu import config
from pointnet2_tpu.ops.pallas.util import LANE as _LANE
from pointnet2_tpu.ops.pallas.util import round_up as _round_up

_PLANE_BUDGET = 1 << 17  # (TN, Mp) f32 working-tile element budget
_K_PAD = 8  # output lane dim (3 used); 8 keeps Mosaic stores well-formed


def _three_nn_kernel(q_ref, d_ref, dist_ref, idx_ref, *, m_real: int):
    q = q_ref[0]  # (TN, 3) unknown points
    xyz = d_ref[0]  # (3, Mp) known points, transposed
    TN = q.shape[0]
    Mp = xyz.shape[1]

    d2 = (jnp.square(q[:, 0:1] - xyz[0:1, :])
          + jnp.square(q[:, 1:2] - xyz[1:2, :])
          + jnp.square(q[:, 2:3] - xyz[2:3, :]))  # (TN, Mp)
    col = jax.lax.broadcasted_iota(jnp.int32, (TN, Mp), 1)
    d = jnp.where(col < m_real, d2, jnp.inf)

    kcol = jax.lax.broadcasted_iota(jnp.int32, (TN, _K_PAD), 1)
    dist_acc = jnp.full((TN, _K_PAD), jnp.inf, jnp.float32)
    idx_acc = jnp.zeros((TN, _K_PAD), jnp.int32)
    for k in range(3):
        v = jnp.min(d, axis=1, keepdims=True)  # (TN, 1)
        # lowest-index argmin (fps.py idiom); an all-inf row (fewer than 3
        # known points) selects lane 0 with dist inf, matching the XLA path
        i = jnp.min(jnp.where(d == v, col, Mp), axis=1, keepdims=True)
        dist_acc = jnp.where(kcol == k, v, dist_acc)
        idx_acc = jnp.where(kcol == k, i, idx_acc)
        d = jnp.where(col == i, jnp.inf, d)

    dist_ref[0] = dist_acc
    idx_ref[0] = idx_acc


@jax.jit
def three_nn_pallas(xyz1: jax.Array, xyz2: jax.Array):
    """3-NN of each xyz1 (B,N,3) point among xyz2 (B,M,3).

    Returns (dist (B,N,3) f32 squared distances ascending, idx (B,N,3) i32).
    """
    B, N, _ = xyz1.shape
    M = xyz2.shape[1]
    # index-producing + reference defines no gradient (NoGradient,
    # tf_interpolate.py:18); also keeps AD from linearizing the kernel
    xyz1 = jax.lax.stop_gradient(xyz1).astype(jnp.float32)
    xyz2 = jax.lax.stop_gradient(xyz2).astype(jnp.float32)

    Mp = _round_up(M, _LANE)
    TN = max(8, min(N, _PLANE_BUDGET // Mp))
    TN = (TN // 8) * 8 if TN >= 8 else 8
    Np = _round_up(N, TN)

    xyz2_t = jnp.moveaxis(xyz2, -1, 1)  # (B, 3, M)
    if Mp != M:
        # lane pads replicate point 0 but are masked out by col < m_real
        pad = jnp.broadcast_to(xyz2_t[:, :, :1], (B, 3, Mp - M))
        xyz2_t = jnp.concatenate([xyz2_t, pad], axis=-1)
    if Np != N:
        padq = jnp.broadcast_to(xyz1[:, :1, :], (B, Np - N, 3))
        xyz1 = jnp.concatenate([xyz1, padq], axis=1)

    out_block = pl.BlockSpec((1, TN, _K_PAD), lambda b, n: (b, n, 0),
                             memory_space=pltpu.VMEM)
    dist, idx = pl.pallas_call(
        partial(_three_nn_kernel, m_real=M),
        grid=(B, Np // TN),
        in_specs=[
            pl.BlockSpec((1, TN, 3), lambda b, n: (b, n, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, Mp), lambda b, n: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_block, out_block],
        out_shape=[
            jax.ShapeDtypeStruct((B, Np, _K_PAD), jnp.float32),
            jax.ShapeDtypeStruct((B, Np, _K_PAD), jnp.int32),
        ],
        interpret=config.interpret_mode(),
    )(xyz1, xyz2_t)
    return dist[:, :N, :3], idx[:, :N, :3]
