"""Pallas TPU kernel for farthest point sampling.

Design (TPU-first, not a translation of tf_sampling_g.cu:105-170):

The CUDA kernel parallelizes the min-distance update over one cloud's points
with a block-wide argmax reduction per selection. On TPU we instead run a
whole *batch tile* in lockstep on the VPU: the running min-distance buffer is
a (TB, N) VMEM-resident array (TB clouds in sublanes, points in lanes), and
each of the `npoint` sequential selections is a handful of full-tile
vector ops:

  1. extract the previously selected point's coords with one masked
     reduction over the packed (3, TB, N) coordinate tile (no dynamic-lane
     gather needed),
  2. update min_dist = min(min_dist, ||p - sel||^2),
  3. masked argmax with lowest-index tie-break,
  4. accumulate the selected index into the output tile.

The selection loop is *latency*-bound: each iteration chains three
cross-lane reductions that cannot overlap across iterations (the running
min-distance is a loop carry). Total latency is `(B/TB) * npoint * depth`,
so TB is chosen as large as the VMEM working set allows (ideally the whole
batch) — the per-iteration vector ops get wider (throughput is unchanged)
while the number of serialized iterations drops by B/TB.

HBM traffic is exactly one read of xyz and one write of idx — the O(npoint*N)
distance work never leaves VMEM. Semantics match the XLA/CUDA reference:
seed index 0, max-of-min-distance selection, lowest-index tie-break.

N is padded to a lane multiple by replicating point 0: a replica's running
distance always equals point 0's, and the lowest-index tie-break can only
resolve to the genuine index.
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

# Budget for TB*Np (elements per (TB, Np) f32 working plane). The kernel
# keeps ~8 such planes live (3 coord, 3 diff, min_dist, iota) plus the
# accumulator: 2^17 elements => ~4 MB of VMEM, well within ~16 MB/core.
_PLANE_BUDGET = 1 << 17




def _fps_kernel(xyz_ref, out_ref, *, npoint: int):
    # xyz_ref: (3, TB, Np) f32; out_ref: (TB, Mp) int32
    xyz = xyz_ref[...]
    _, TB, Np = xyz.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (TB, Np), 1)
    mcol = jax.lax.broadcasted_iota(jnp.int32, (TB, out_ref.shape[1]), 1)

    def body(j, carry):
        min_dist, last, acc = carry  # (TB,Np) f32, (TB,1) i32, (TB,Mp) i32
        sel = col == last
        # one packed masked reduction extracts (px, py, pz) together
        p = jnp.sum(jnp.where(sel[None], xyz, 0.0), axis=2, keepdims=True)
        diff = xyz - p  # (3, TB, Np)
        d = diff[0] * diff[0] + diff[1] * diff[1] + diff[2] * diff[2]
        min_dist = jnp.minimum(min_dist, d)
        best = jnp.max(min_dist, axis=1, keepdims=True)
        nxt = jnp.min(jnp.where(min_dist == best, col, Np), axis=1,
                      keepdims=True)
        nxt = nxt.astype(jnp.int32)
        acc = jnp.where(mcol == j, nxt, acc)
        return min_dist, nxt, acc

    # A replicated point-0 pad column behaves exactly like point 0, whose
    # min-dist drops to 0 at the first update, so pads are never argmax
    # winners ahead of a genuine point.
    init = (
        jnp.full((TB, Np), 1e38, jnp.float32),
        jnp.zeros((TB, 1), jnp.int32),
        jnp.zeros((TB, out_ref.shape[1]), jnp.int32),
    )
    _, _, acc = jax.lax.fori_loop(1, npoint, body, init)
    out_ref[:, :] = acc


def _pick_tb(B: int, Np: int) -> int:
    cap = max(1, _PLANE_BUDGET // Np)
    if B <= cap:
        return B
    # largest divisor of B that fits the budget
    best = 1
    for tb in range(1, min(B, cap) + 1):
        if B % tb == 0:
            best = tb
    return best


@partial(jax.jit, static_argnames=("npoint",))
def fps_pallas(xyz: jax.Array, npoint: int) -> jax.Array:
    """Farthest point sampling. xyz: (B, N, 3) -> (B, npoint) int32."""
    B, N, _ = xyz.shape
    xyz = xyz.astype(jnp.float32)
    if npoint == 1:
        return jnp.zeros((B, 1), jnp.int32)

    TB = _pick_tb(B, _round_up(N, _LANE))
    Np = _round_up(N, _LANE)
    Mp = _round_up(npoint, _LANE)

    # (B, N, 3) -> (3, B, Np), padding lanes with replicas of point 0.
    xyz_t = jnp.moveaxis(xyz, -1, 0)  # (3, B, N)
    if Np != N:
        pad = jnp.broadcast_to(xyz_t[:, :, :1], (3, B, Np - N))
        xyz_t = jnp.concatenate([xyz_t, pad], axis=-1)

    grid = (B // TB,)
    out = pl.pallas_call(
        partial(_fps_kernel, npoint=npoint),
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, TB, Np), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((TB, Mp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Mp), jnp.int32),
        interpret=config.interpret_mode(),
    )(xyz_t)
    return out[:, :npoint]
