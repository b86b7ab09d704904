"""Pallas TPU kernels for fixed-radius ball query (+ fused xyz grouping).

Design (TPU-first, not a translation of tf_grouping_g.cu:3-36):

The CUDA kernel gives each query point a thread that scans all n dataset
points sequentially. On TPU we tile queries into sublanes and dataset points
into lanes: a (TM, N) squared-distance tile is computed with three
broadcasted VPU ops (exact, no matmul rounding), and the order-dependent
"first nsample hits in scan order" selection is realised rank-first: an
inclusive cumulative sum of the hit mask along the lane axis assigns every
hit its slot. The cumsum itself runs on the MXU: the 0/1 hit mask and a
lower-triangular ones matrix are exactly representable in bfloat16, and the
MXU accumulates in f32, so `mask @ tril` is an *exact* integer cumsum at
bf16 matmul speed. The triangle is chunked at `_CUMSUM_CHUNK` (256) lanes
so it stays in VMEM; the MXU path handles lane counts that are a multiple
of the chunk OR fit in a single (sub-chunk) triangle, and a Hillis-Steele
VPU fallback covers the remaining non-divisible cases.

Slot extraction exploits that the rank vector is non-decreasing along the
scan: the index of the (k+1)-th hit equals the *count* of lanes with
rank <= k (every lane strictly before the (k+1)-th hit — hit or miss — has
rank <= k, every lane from it on has rank >= k+1). Each of the `nsample`
slots is therefore one compare + one lane-reduction, with no sequential
dependency between slots, so the VPU pipelines them. The (TM, N) tile lives
entirely in VMEM; the (B, M, N) distance matrix never reaches HBM (the XLA
fallback materialises it and pays a top_k sort on top).

`ball_query_group_xyz_pallas` additionally emits the *gathered* neighbor
coordinates: slot k's hit lane is extracted with one packed masked
reduction over a (3, TM, N) coordinate tile, which replaces the entire
separate C=3 one-hot gather pass of sample_and_group
(utils/pointnet_util.py:45 does FPS-gather + ball query + group as separate
CUDA ops; here one fused kernel).

Pad-with-first-hit semantics and the in-ball count (capped at nsample)
match tf_grouping_g.cu:14-34 exactly; queries with an empty ball get
index 0 (the reference leaves uninitialised memory there).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pointnet2_tpu import config
from pointnet2_tpu.ops.pallas.util import LANE as _LANE
from pointnet2_tpu.ops.pallas.util import round_up as _round_up

# MXU cumsum triangle size. The matmul cost is TM*Np*CHUNK, so smaller
# chunks are cheaper (the serial offset chain between chunks is negligible);
# 256 balances MXU efficiency against chain length.
_CUMSUM_CHUNK = 256


def _cumsum_lanes_vpu(x: jax.Array, col: jax.Array) -> jax.Array:
    """Inclusive cumsum along the lane axis via log-step shifted adds."""
    n = x.shape[1]
    s = 1
    while s < n:
        shifted = pltpu.roll(x, s, 1)
        x = x + jnp.where(col >= s, shifted, 0)
        s *= 2
    return x


def _cumsum_lanes_mxu(mask: jax.Array) -> jax.Array:
    """Exact inclusive cumsum of a 0/1 mask via bf16 MXU matmul.

    0/1 operands are exact in bf16 and the MXU accumulates in f32, so the
    result is the exact integer rank (as f32) for any N < 2^24.
    """
    TM, Np = mask.shape
    ch = _CUMSUM_CHUNK if Np % _CUMSUM_CHUNK == 0 else Np
    maskf = mask.astype(jnp.bfloat16)
    li = jax.lax.broadcasted_iota(jnp.int32, (ch, ch), 0)
    lj = jax.lax.broadcasted_iota(jnp.int32, (ch, ch), 1)
    tril = (li <= lj).astype(jnp.bfloat16)  # [j', j] = 1 iff j' <= j
    parts = []
    offset = jnp.zeros((TM, 1), jnp.float32)
    for c in range(Np // ch):
        # pin DEFAULT precision: 0/1 bf16 operands are exact anyway, and
        # an ambient jax.default_matmul_precision("highest") context must
        # not leak HIGHEST into Mosaic (rejected: "Bad lhs type")
        rc = jnp.dot(maskf[:, c * ch:(c + 1) * ch], tril,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.DEFAULT) + offset
        parts.append(rc)
        offset = rc[:, -1:]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)


def _ball_query_kernel(q_ref, d_ref, *out_refs, r2: float, nsample: int,
                       n_real: int, with_xyz: bool):
    # q_ref: (1, TM, 3) queries; d_ref: (1, 3, Np) dataset (transposed)
    q = q_ref[0]  # (TM, 3)
    xyz = d_ref[0]  # (3, Np)
    x = xyz[0:1, :]
    y = xyz[1:2, :]
    z = xyz[2:3, :]
    TM = q.shape[0]
    Np = x.shape[1]

    d2 = (jnp.square(q[:, 0:1] - x) + jnp.square(q[:, 1:2] - y)
          + jnp.square(q[:, 2:3] - z))  # (TM, Np)
    col = jax.lax.broadcasted_iota(jnp.int32, (TM, Np), 1)
    mask = (d2 < r2) & (col < n_real)

    if Np % _CUMSUM_CHUNK == 0 or Np <= _CUMSUM_CHUNK:
        rank = _cumsum_lanes_mxu(mask)  # (TM, Np) f32, exact integers
    else:
        rank = _cumsum_lanes_vpu(mask.astype(jnp.int32), col).astype(
            jnp.float32)
    total = rank[:, -1:].astype(jnp.int32)  # (TM, 1) number of hits

    # index of the (k+1)-th hit == #lanes with rank <= k (rank is a
    # non-decreasing step function of the lane; see module docstring)
    # (bf16 compares would halve the VPU cost here, but Mosaic on this
    # target rejects bf16 cmpf — keep f32)
    def slot_count(k):
        return jnp.sum((rank <= jnp.float32(k)).astype(jnp.int32), axis=1,
                       keepdims=True)

    idx0 = jnp.where(total > 0, slot_count(0), 0)  # pad: first hit, else 0

    if with_xyz:
        # hit-only ranks: sel (r1 == k+1) isolates exactly the (k+1)-th hit
        r1 = jnp.where(mask, rank, 0.0)
        sel0 = col == idx0  # first hit (or point 0 for an empty ball)
        pads = jnp.sum(jnp.where(sel0[None], xyz[:, None, :], 0.0), axis=2,
                       keepdims=True)  # (3, TM, 1)

    # Per-slot extraction, unrolled in chunks so the (independent) slot
    # reductions pipeline on the VPU while the live set stays bounded.
    slot_col = jax.lax.broadcasted_iota(jnp.int32, (TM, nsample), 1)
    chunk = 8 if nsample % 8 == 0 else 1

    def slot_chunk(k0, carry):
        accs = list(carry)
        for dk in range(chunk):
            k = k0 * chunk + dk
            has = total > k
            write = slot_col == k
            idxk = slot_count(k)
            accs[0] = jnp.where(write, jnp.where(has, idxk, idx0), accs[0])
            if with_xyz:
                sel = r1 == jnp.float32(k + 1)
                v = jnp.sum(jnp.where(sel[None], xyz[:, None, :], 0.0),
                            axis=2, keepdims=True)  # (3, TM, 1)
                for i in range(3):
                    accs[1 + i] = jnp.where(
                        write, jnp.where(has, v[i], pads[i]), accs[1 + i])
        return tuple(accs)

    n_out = 4 if with_xyz else 1
    init = (jnp.zeros((TM, nsample), jnp.int32),) + tuple(
        jnp.zeros((TM, nsample), jnp.float32) for _ in range(n_out - 1))
    accs = jax.lax.fori_loop(0, nsample // chunk, slot_chunk, init)

    out_refs[0][0] = accs[0]
    out_refs[1][0] = jnp.minimum(total, nsample).astype(jnp.int32)
    if with_xyz:
        for ref, acc in zip(out_refs[2:], accs[1:]):
            ref[0] = acc


def _run(radius: float, nsample: int, xyz1: jax.Array, xyz2: jax.Array,
         with_xyz: bool):
    B, N, _ = xyz1.shape
    M = xyz2.shape[1]
    xyz1 = xyz1.astype(jnp.float32)
    xyz2 = xyz2.astype(jnp.float32)

    Np = _round_up(N, _LANE)
    # Budget the (TM, Np) f32 working tiles to stay comfortably in VMEM
    # (the with_xyz variant keeps a packed (3, TM, Np) tile live).
    budget = (1 << 17) if with_xyz else (1 << 18)
    TM = max(8, min(M, budget // Np))
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

    slot_block = pl.BlockSpec((1, TM, nsample), lambda b, m: (b, m, 0),
                              memory_space=pltpu.VMEM)
    out_specs = [
        slot_block,
        pl.BlockSpec((1, TM, 1), lambda b, m: (b, m, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, Mp, nsample), jnp.int32),
        jax.ShapeDtypeStruct((B, Mp, 1), jnp.int32),
    ]
    if with_xyz:
        out_specs += [slot_block] * 3
        out_shape += [jax.ShapeDtypeStruct((B, Mp, nsample), jnp.float32)] * 3

    grid = (B, Mp // TM)
    # f32-rounded threshold: the XLA path compares d2 < f32(radius)**2 in
    # f32; a python-f64 radius**2 differs by an ulp for e.g. radius=0.1
    # and flips boundary points between the two implementations
    r2_f32 = float(np.square(np.float32(radius)))
    outs = pl.pallas_call(
        partial(_ball_query_kernel, r2=r2_f32, nsample=nsample,
                n_real=N, with_xyz=with_xyz),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TM, 3), lambda b, m: (b, m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, Np), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=config.interpret_mode(),
    )(xyz2, xyz1_t)
    idx, cnt = outs[0][:, :M], outs[1][:, :M, 0]
    if not with_xyz:
        return idx, cnt
    grouped_xyz = jnp.stack([o[:, :M] for o in outs[2:]], axis=-1)
    return idx, cnt, grouped_xyz


@partial(jax.jit, static_argnames=("radius", "nsample"))
def ball_query_pallas(radius: float, nsample: int, xyz1: jax.Array,
                      xyz2: jax.Array):
    """Ball query. xyz1: (B,N,3) dataset, xyz2: (B,M,3) queries.

    Returns (idx (B,M,nsample) int32, pts_cnt (B,M) int32).
    """
    return _run(radius, nsample, xyz1, xyz2, with_xyz=False)


def _select_slots(rank, total, nsample: int):
    """Scan-order slot extraction from a rank vector (see module docstring):
    slot k's dataset index == #lanes with rank <= k; pad with the first hit
    (index 0 for an empty ball). Returns (idx (TM, nsample) i32,
    cnt (TM, 1) i32)."""
    TM = rank.shape[0]

    def slot_count(k):
        return jnp.sum((rank <= jnp.float32(k)).astype(jnp.int32), axis=1,
                       keepdims=True)

    idx0 = jnp.where(total > 0, slot_count(0), 0)
    slot_col = jax.lax.broadcasted_iota(jnp.int32, (TM, nsample), 1)
    chunk = 8 if nsample % 8 == 0 else 1

    def slot_chunk(k0, acc):
        for dk in range(chunk):
            k = k0 * chunk + dk
            has = total > k
            write = slot_col == k
            acc = jnp.where(write, jnp.where(has, slot_count(k), idx0), acc)
        return acc

    idx = jax.lax.fori_loop(0, nsample // chunk, slot_chunk,
                            jnp.zeros((TM, nsample), jnp.int32))
    return idx, jnp.minimum(total, nsample).astype(jnp.int32)


def _ball_query_multi_kernel(q_ref, d_ref, *out_refs, r2s, nsamples,
                             n_real: int):
    """Multi-radius ball query on ONE in-VMEM distance tile.

    The MSG stacks issue one ball query per radius over the SAME
    (query, dataset) pair (utils/pointnet_util.py:168 loops radius_list);
    each standalone kernel rebuilds the identical (TM, Np) squared-distance
    tile and re-DMAs the inputs. Here the tile is computed once; only the
    per-radius mask -> MXU rank cumsum -> slot extraction reruns (those
    are mask-specific: the scan-order slots of radius r cannot be derived
    from another radius's slots, even nested)."""
    q = q_ref[0]  # (TM, 3)
    xyz = d_ref[0]  # (3, Np)
    x = xyz[0:1, :]
    y = xyz[1:2, :]
    z = xyz[2:3, :]
    TM = q.shape[0]
    Np = x.shape[1]

    d2 = (jnp.square(q[:, 0:1] - x) + jnp.square(q[:, 1:2] - y)
          + jnp.square(q[:, 2:3] - z))  # (TM, Np) — computed ONCE
    col = jax.lax.broadcasted_iota(jnp.int32, (TM, Np), 1)
    use_mxu = Np % _CUMSUM_CHUNK == 0 or Np <= _CUMSUM_CHUNK

    for ri, (r2, nsample) in enumerate(zip(r2s, nsamples)):
        mask = (d2 < r2) & (col < n_real)
        if use_mxu:
            rank = _cumsum_lanes_mxu(mask)
        else:
            rank = _cumsum_lanes_vpu(mask.astype(jnp.int32), col).astype(
                jnp.float32)
        total = rank[:, -1:].astype(jnp.int32)
        idx, cnt = _select_slots(rank, total, nsample)
        out_refs[2 * ri][0] = idx
        out_refs[2 * ri + 1][0] = cnt


@partial(jax.jit, static_argnames=("radii", "nsamples"))
def ball_query_multi_pallas(radii: tuple, nsamples: tuple, xyz1: jax.Array,
                            xyz2: jax.Array):
    """Fused multi-radius ball query (one distance-tile pass for all radii).

    xyz1: (B,N,3) dataset, xyz2: (B,M,3) queries; radii/nsamples are
    equal-length tuples. Returns a tuple of (idx (B,M,nsample_i) i32,
    cnt (B,M) i32) pairs, each bit-identical to
    ``ball_query_pallas(radii[i], nsamples[i], xyz1, xyz2)``.
    """
    B, N, _ = xyz1.shape
    M = xyz2.shape[1]
    xyz1 = xyz1.astype(jnp.float32)
    xyz2 = xyz2.astype(jnp.float32)

    Np = _round_up(N, _LANE)
    budget = 1 << 18
    TM = max(8, min(M, budget // Np))
    TM = (TM // 8) * 8 if TM >= 8 else 8
    Mp = _round_up(M, TM)

    xyz1_t = jnp.moveaxis(xyz1, -1, 1)  # (B, 3, N)
    if Np != N:
        pad = jnp.broadcast_to(xyz1_t[:, :, :1], (B, 3, Np - N))
        xyz1_t = jnp.concatenate([xyz1_t, pad], axis=-1)
    if Mp != M:
        padq = jnp.broadcast_to(xyz2[:, :1, :], (B, Mp - M, 3))
        xyz2 = jnp.concatenate([xyz2, padq], axis=1)

    out_specs = []
    out_shape = []
    for ns in nsamples:
        out_specs += [
            pl.BlockSpec((1, TM, ns), lambda b, m: (b, m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TM, 1), lambda b, m: (b, m, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((B, Mp, ns), jnp.int32),
            jax.ShapeDtypeStruct((B, Mp, 1), jnp.int32),
        ]

    r2s = tuple(float(np.square(np.float32(r))) for r in radii)
    outs = pl.pallas_call(
        partial(_ball_query_multi_kernel, r2s=r2s,
                nsamples=tuple(nsamples), n_real=N),
        grid=(B, Mp // TM),
        in_specs=[
            pl.BlockSpec((1, TM, 3), lambda b, m: (b, m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, Np), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=config.interpret_mode(),
    )(xyz2, xyz1_t)
    return tuple((outs[2 * i][:, :M], outs[2 * i + 1][:, :M, 0])
                 for i in range(len(radii)))


@partial(jax.jit, static_argnames=("radius", "nsample"))
def ball_query_group_xyz_pallas(radius: float, nsample: int, xyz1: jax.Array,
                                xyz2: jax.Array):
    """Fused ball query + neighbor-coordinate gather.

    Returns (idx, pts_cnt, grouped_xyz (B,M,nsample,3) uncentered f32).
    grouped_xyz[b,m,k] == xyz1[b, idx[b,m,k]] exactly.
    """
    return _run(radius, nsample, xyz1, xyz2, with_xyz=True)
