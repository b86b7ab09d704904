"""Fused (BN -> ReLU -> Dense)* ... -> max-pool chain for the SA hot path.

The per-point MLP of every set-abstraction module (reference
utils/pointnet_util.py:117-140: conv2d 1x1 + batch-norm + ReLU stacks
followed by a max over the nsample axis at :126-127) is, on TPU, a chain of
large skinny matmuls separated by memory-bound elementwise/reduction
passes. Left to XLA, each training layer costs ~4 full HBM passes over the
(B, npoint, nsample, C) grouped tensor forward (matmul write, stats
reduce, normalize+ReLU read/write) and ~6 more backward — measured, this
elementwise traffic is over half the train-step time of the flagship
classifier (benchmarks/probe_mlp.py).

This module fuses the whole chain into one Pallas kernel per dense layer:

  forward   y_k = relu(y_{k-1} * a_{k-1} + b_{k-1}) @ W_k + bias_k
            with the per-channel batch sums/sum-of-squares of y_k
            accumulated in VMEM during the same pass (BN statistics cost
            zero extra HBM traffic), and the final layer's BN+ReLU+max-pool
            applied in the epilogue so the widest activation tensor is
            never written to HBM at all.

  backward  rematerializes: each layer's kernel recomputes the cheap
            elementwise pieces (the BN affine, the ReLU, the pool argmax)
            from the saved *pre-BN* activations in VMEM, accumulates the
            BN reduction totals for the layer below, and produces dW / db /
            the propagated cotangent in a single pass. The max-pool
            cotangent is routed through an integer argmax recomputed
            in-kernel (first-occurrence tie-break, matching
            ops/pooling.max_pool and the reference CUDA kernels' tie rule).

BN semantics match nn.layers.BatchNorm exactly: float32 statistics over all
axes but channels, var = max(E[y^2] - E[y]^2, 0), eps inside rsqrt, and
cross-replica pmean of (mean, meansq) when a BN axis is active (the
backward pmeans the reduction totals symmetrically).

Parameter layout: the chain covers BN_0 .. BN_D and dense layers W_1 .. W_D
(the SA module lifts dense_0 through the neighbor gather — nn/pointnet.py —
so the chain input is the pre-BN_0 grouped tensor).

Shapes are static and tiles are exact divisors (the caller guarantees the
row counts are divisible by a power-of-two tile; see `fused_chain_eligible`),
so kernels carry no masking.

STATUS — measured result (TPU v5e, 2026-08): these kernels are *slower*
than the unfused XLA path and are therefore OFF by default
(config.fused_mlp_enabled). Root cause, established with bare-copy probes:
Pallas kernel pipelines on this chip/platform cap at ~400-450 GB/s of HBM
throughput regardless of block shape, grid layout, dimension semantics, or
manual double-buffered DMA — while XLA's own fused elementwise/reduction
code exceeds 800 GB/s on identical access patterns (and XLA already fuses
the BN stats reductions and normalize+ReLU chains aggressively, so the
traffic this design eliminates is smaller than a naive pass count
suggests). The same ceiling is why the neighbor gather/scatter ops default
to the XLA einsum formulation rather than their Pallas kernels
(config.resolve_gather_impl). The module stays fully tested (interpret and
compiled) as a drop-in option for hardware where the Pallas/XLA balance
differs, and as the reference implementation of the fused algorithm.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pointnet2_tpu import config


def _pow2_divisor(n: int, cap: int) -> int:
    """Largest power of two that divides n, capped."""
    d = n & (-n)  # largest power-of-2 factor
    return min(d, cap)


def _row_tile(rows: int, cin: int, cout: int, itemsize: int,
              budget: int = 1 << 20) -> int:
    """Row tile for the dense kernels.

    `budget` bounds tile_rows * channels * itemsize; the kernel body's f32
    temporaries are a small multiple of that, so the default keeps well
    under the ~16 MB VMEM scoped limit. Backward kernels (more live
    temporaries) pass a tighter budget."""
    per_row = max((cin + cout) * itemsize, 1)
    cap = max(16, 1 << max((budget // per_row).bit_length() - 1, 0))
    return _pow2_divisor(rows, min(cap, 2048))


def _group_tile(groups: int, s: int, cmax: int, itemsize: int,
                budget: int = 1 << 20) -> int:
    per_group = max(s * cmax * itemsize, 1)
    cap = max(1, 1 << max((budget // per_group).bit_length() - 1, 0))
    return _pow2_divisor(groups, min(cap, 1024))


# the backward kernels keep ~6 float32 tile-sized temporaries live
_BWD_BUDGET = 1 << 18


class ChainConfig(NamedTuple):
    """Static chain description (hashable: used as a nondiff argnum)."""

    eps: float
    axis_name: str | None  # cross-replica BN axis (None: no sync)
    pool: bool  # max-pool over the S axis in the epilogue


# ---------------------------------------------------------------------------
# forward kernels
# ---------------------------------------------------------------------------


def _dense_fwd_kernel(x_ref, ab_ref, w_ref, bias_ref, y_ref, s_ref, ss_ref,
                      *, want_stats: bool):
    """y = relu(x * a + b) @ W + bias; accumulate sum / sumsq of y."""
    x = x_ref[...].astype(jnp.float32)
    z = jnp.maximum(x * ab_ref[0][None, :] + ab_ref[1][None, :], 0.0)
    z = z.astype(w_ref.dtype)
    acc = jax.lax.dot_general(
        z, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)  # insulate from ambient ctx
    y = (acc + bias_ref[0][None, :]).astype(y_ref.dtype)
    y_ref[...] = y
    if want_stats:
        i = pl.program_id(0)
        yf = y.astype(jnp.float32)

        @pl.when(i == 0)
        def _():
            s_ref[...] = jnp.zeros_like(s_ref)
            ss_ref[...] = jnp.zeros_like(ss_ref)

        s_ref[...] += jnp.sum(yf, axis=0, keepdims=True)
        ss_ref[...] += jnp.sum(yf * yf, axis=0, keepdims=True)


def _dense_fwd(x2d, a, b, w, bias, *, want_stats: bool):
    """x2d (R, Cin) -> y (R, Cout), sum (1, Cout) f32, sumsq (1, Cout) f32.

    The chain always has a leading BN affine (the SA modules lift the first
    dense through the gather), so the kernel applies relu(x*a + b) before
    the matmul unconditionally."""
    R, Cin = x2d.shape
    Cout = w.shape[1]
    TR = _row_tile(R, Cin, Cout, x2d.dtype.itemsize)
    ab = jnp.stack([a, b])
    y, s, ss = pl.pallas_call(
        partial(_dense_fwd_kernel, want_stats=want_stats),
        grid=(R // TR,),
        in_specs=[
            pl.BlockSpec((TR, Cin), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, Cin), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Cin, Cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TR, Cout), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, Cout), x2d.dtype),
            jax.ShapeDtypeStruct((1, Cout), jnp.float32),
            jax.ShapeDtypeStruct((1, Cout), jnp.float32),
        ],
        interpret=config.interpret_mode(),
    )(x2d, ab, w.astype(x2d.dtype), bias[None].astype(jnp.float32))
    return y, s, ss


def _pool_fwd_kernel(y_ref, ab_ref, out_ref):
    """out = max_S relu(y * a + b), in the activation dtype."""
    y = y_ref[...].astype(jnp.float32)
    z = jnp.maximum(y * ab_ref[0][None, None, :] + ab_ref[1][None, None, :],
                    0.0).astype(out_ref.dtype)
    out_ref[...] = jnp.max(z, axis=1)


def _pool_fwd(y3d, a, b):
    """y3d (G, S, C) -> pooled (G, C)."""
    G, S, C = y3d.shape
    TG = _group_tile(G, S, C, y3d.dtype.itemsize)
    return pl.pallas_call(
        _pool_fwd_kernel,
        grid=(G // TG,),
        in_specs=[
            pl.BlockSpec((TG, S, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TG, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, C), y3d.dtype),
        interpret=config.interpret_mode(),
    )(y3d, jnp.stack([a, b]))


def _affine_fwd_kernel(y_ref, ab_ref, out_ref):
    y = y_ref[...].astype(jnp.float32)
    out_ref[...] = jnp.maximum(
        y * ab_ref[0][None, :] + ab_ref[1][None, :], 0.0).astype(
            out_ref.dtype)


def _affine_fwd(y2d, a, b):
    """No-pool tail: z = relu(y * a + b), (R, C) -> (R, C)."""
    R, C = y2d.shape
    TR = _row_tile(R, C, C, y2d.dtype.itemsize)
    return pl.pallas_call(
        _affine_fwd_kernel,
        grid=(R // TR,),
        in_specs=[
            pl.BlockSpec((TR, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TR, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, C), y2d.dtype),
        interpret=config.interpret_mode(),
    )(y2d, jnp.stack([a, b]))


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------
#
# Per-BN packed parameter rows (f32, shape (7, C)):
#   0: a     = gamma * rsqrt(var + eps)        (affine scale)
#   1: b     = beta - mean * a                 (affine shift)
#   2: mu    = mean
#   3: r     = rsqrt(var + eps)
#   4: gr    = gamma * r                       (BN backward scale)
#   5: m1    = global mean of dout             (0 for running-stat BN)
#   6: m2    = global mean of dout * yhat      (0 for running-stat BN)


def _bn_pack(scale, bias, mean, var, eps, m1=None, m2=None):
    r = jax.lax.rsqrt(var + eps)
    a = scale * r
    b = bias - mean * a
    z = jnp.zeros_like(mean)
    return jnp.stack([a, b, mean, r, scale * r,
                      z if m1 is None else m1,
                      z if m2 is None else m2])


def _top_stats_kernel(y_ref, g_ref, p_ref, t1_ref, t2_ref, *, pool: bool):
    """Accumulate T1 = sum(dout), T2 = sum(dout * yhat) for the top BN."""
    i = pl.program_id(0)
    y = y_ref[...].astype(jnp.float32)
    a, b_, mu, r = p_ref[0], p_ref[1], p_ref[2], p_ref[3]
    if pool:
        out = y * a[None, None, :] + b_[None, None, :]
        z = jnp.maximum(out, 0.0).astype(y_ref.dtype)
        # argmax on the exact f32 upcast (Mosaic lowers argmax only for f32);
        # bf16 -> f32 is exact so ordering and first-occurrence ties match
        am = jnp.argmax(z.astype(jnp.float32), axis=1)
        sel = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1) == am[:, None, :]
        dz = jnp.where(sel, g_ref[...].astype(jnp.float32)[:, None, :], 0.0)
        dout = dz * (out > 0)
        yhat = (y - mu[None, None, :]) * r[None, None, :]
        red = (0, 1)
    else:
        out = y * a[None, :] + b_[None, :]
        dout = g_ref[...].astype(jnp.float32) * (out > 0)
        yhat = (y - mu[None, :]) * r[None, :]
        red = (0,)

    @pl.when(i == 0)
    def _():
        t1_ref[...] = jnp.zeros_like(t1_ref)
        t2_ref[...] = jnp.zeros_like(t2_ref)

    t1_ref[...] += jnp.sum(dout, axis=red).reshape(1, -1)
    t2_ref[...] += jnp.sum(dout * yhat, axis=red).reshape(1, -1)


def _top_stats(y, g, p, *, pool: bool):
    if pool:
        G, S, C = y.shape
        TG = _group_tile(G, S, C, y.dtype.itemsize, budget=_BWD_BUDGET)
        grid = (G // TG,)
        in_specs = [
            pl.BlockSpec((TG, S, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TG, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((7, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
    else:
        R, C = y.shape
        TR = _row_tile(R, C, C, y.dtype.itemsize, budget=_BWD_BUDGET)
        grid = (R // TR,)
        in_specs = [
            pl.BlockSpec((TR, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((7, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
    return pl.pallas_call(
        partial(_top_stats_kernel, pool=pool),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ],
        interpret=config.interpret_mode(),
    )(y, g, p)


def _dense_bwd_kernel(yk_ref, yp_ref, g_ref, pk_ref, pp_ref, w_ref,
                      gout_ref, dw_ref, db_ref, t1_ref, t2_ref,
                      *, top_pool: bool):
    """One backward pass for dense layer k.

    Recomputes out_k / the pool routing / z_{k-1} in VMEM; emits
    g_{k-1} = dz_{k-1}, accumulates dW_k, dbias_k and (when the layer below
    has a BN) the BN_{k-1} reduction totals T1/T2.
    """
    i = pl.program_id(0)
    pk = pk_ref[...]
    yk = yk_ref[...].astype(jnp.float32)
    if top_pool:
        TG, S, Ck = yk.shape
        out_k = yk * pk[0][None, None, :] + pk[1][None, None, :]
        z = jnp.maximum(out_k, 0.0).astype(yk_ref.dtype)
        am = jnp.argmax(z.astype(jnp.float32), axis=1)  # f32: Mosaic limit
        sel = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1) == am[:, None, :]
        dz = jnp.where(sel, g_ref[...].astype(jnp.float32)[:, None, :], 0.0)
        rows = TG * S
        out_k = out_k.reshape(rows, Ck)
        dz = dz.reshape(rows, Ck)
        yk = yk.reshape(rows, Ck)
    else:
        rows, Ck = yk.shape
        out_k = yk * pk[0][None, :] + pk[1][None, :]
        dz = g_ref[...].astype(jnp.float32)
    dout = dz * (out_k > 0)
    yhat = (yk - pk[2][None, :]) * pk[3][None, :]
    dy = pk[4][None, :] * (dout - pk[5][None, :] - yhat * pk[6][None, :])

    # the chain always has a BN below every dense (BN_0 covers the chain
    # input), so the below-layer activation is recomputed unconditionally
    yp = yp_ref[...].astype(jnp.float32)
    pp = pp_ref[...]
    Cp = yp.shape[-1]
    yp = yp.reshape(rows, Cp)
    out_p = yp * pp[0][None, :] + pp[1][None, :]
    zp = jnp.maximum(out_p, 0.0).astype(yp_ref.dtype)

    dy_c = dy.astype(yp_ref.dtype)
    dw = jax.lax.dot_general(zp, dy_c, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.DEFAULT)
    dzp = jax.lax.dot_general(dy_c, w_ref[...], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.DEFAULT)
    dzp_c = dzp.astype(gout_ref.dtype)
    gout_ref[...] = dzp_c.reshape(gout_ref.shape)

    @pl.when(i == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        t1_ref[...] = jnp.zeros_like(t1_ref)
        t2_ref[...] = jnp.zeros_like(t2_ref)

    dw_ref[...] += dw
    db_ref[...] += jnp.sum(dy, axis=0, keepdims=True)
    # totals from the *rounded* cotangent, identical to what the next
    # kernel will reload
    doutp = dzp_c.astype(jnp.float32) * (out_p > 0)
    yhatp = (yp - pp[2][None, :]) * pp[3][None, :]
    t1_ref[...] += jnp.sum(doutp, axis=0, keepdims=True)
    t2_ref[...] += jnp.sum(doutp * yhatp, axis=0, keepdims=True)


def _dense_bwd(yk, yp, g, pk, pp, w, *, top_pool: bool):
    """Backward for dense layer k.

    yk: (G, S, Ck) when top_pool else (R, Ck); yp: rows x Cp (pre-BN_{k-1});
    g: (G, Ck) pooled cotangent when top_pool else (R, Ck) dz_k.
    Returns (g_{k-1} (R, Cp), dW (Cp, Ck), db (1, Ck), T1, T2 (1, Cp)).
    """
    if top_pool:
        G, S, Ck = yk.shape
        Cp = yp.shape[-1]
        TG = _group_tile(G, S, max(Ck, Cp), yk.dtype.itemsize,
                         budget=_BWD_BUDGET)
        grid = (G // TG,)
        rows = G * S
        yp3 = yp.reshape(G, S, Cp)
        in_specs = [
            pl.BlockSpec((TG, S, Ck), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TG, S, Cp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TG, Ck), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((7, Ck), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((7, Cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Cp, Ck), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        gout_spec = pl.BlockSpec((TG, S, Cp), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
        gout_shape = jax.ShapeDtypeStruct((G, S, Cp), yk.dtype)
        args = (yk, yp3, g)
    else:
        R, Ck = yk.shape
        Cp = yp.shape[-1]
        TR = _row_tile(R, Ck + Cp, Ck + Cp, yk.dtype.itemsize,
                       budget=_BWD_BUDGET)
        grid = (R // TR,)
        rows = R
        in_specs = [
            pl.BlockSpec((TR, Ck), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, Cp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, Ck), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((7, Ck), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((7, Cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Cp, Ck), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        gout_spec = pl.BlockSpec((TR, Cp), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
        gout_shape = jax.ShapeDtypeStruct((R, Cp), yk.dtype)
        args = (yk, yp.reshape(R, Cp), g)

    gout, dw, db, t1, t2 = pl.pallas_call(
        partial(_dense_bwd_kernel, top_pool=top_pool),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            gout_spec,
            pl.BlockSpec((Cp, Ck), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Ck), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            gout_shape,
            jax.ShapeDtypeStruct((Cp, Ck), jnp.float32),
            jax.ShapeDtypeStruct((1, Ck), jnp.float32),
            jax.ShapeDtypeStruct((1, Cp), jnp.float32),
            jax.ShapeDtypeStruct((1, Cp), jnp.float32),
        ],
        interpret=config.interpret_mode(),
    )(*args, pk, pp, w.astype(yk.dtype))
    del rows
    return gout.reshape(-1, Cp), dw, db, t1, t2


def _first_bwd_kernel(x_ref, g_ref, p_ref, dx_ref):
    """dx for the leading BN (no dense below): pure elementwise."""
    p = p_ref[...]
    x = x_ref[...].astype(jnp.float32)
    out = x * p[0][None, :] + p[1][None, :]
    dout = g_ref[...].astype(jnp.float32) * (out > 0)
    yhat = (x - p[2][None, :]) * p[3][None, :]
    dy = p[4][None, :] * (dout - p[5][None, :] - yhat * p[6][None, :])
    dx_ref[...] = dy.astype(dx_ref.dtype)


def _first_bwd(x2d, g, p):
    R, C = x2d.shape
    TR = _row_tile(R, C, C, x2d.dtype.itemsize, budget=_BWD_BUDGET)
    return pl.pallas_call(
        _first_bwd_kernel,
        grid=(R // TR,),
        in_specs=[
            pl.BlockSpec((TR, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((7, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TR, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, C), x2d.dtype),
        interpret=config.interpret_mode(),
    )(x2d, g, p)


# ---------------------------------------------------------------------------
# chain driver
# ---------------------------------------------------------------------------


def _sync(v, axis_name):
    if axis_name is not None:
        return jax.lax.pmean(v, axis_name)
    return v


def _chain_fwd_impl(cfg: ChainConfig, x, denses, scales, biases):
    """Returns (out, stats, saved) — saved = per-layer pre-BN activations."""
    B, M, S, C0 = x.shape
    n = B * M * S
    x2d = x.reshape(n, C0)

    mean = _sync(jnp.mean(x2d.astype(jnp.float32), axis=0), cfg.axis_name)
    meansq = _sync(jnp.mean(jnp.square(x2d.astype(jnp.float32)), axis=0),
                   cfg.axis_name)
    var = jnp.maximum(meansq - jnp.square(mean), 0.0)
    stats = [(mean, var)]
    saved = [x2d]

    cur = x2d
    a = scales[0] * jax.lax.rsqrt(var + cfg.eps)
    b = biases[0] - mean * a
    for k, (w, bias) in enumerate(denses):
        y, s, ss = _dense_fwd(cur, a, b, w, bias, want_stats=True)
        mean = _sync(s[0] / n, cfg.axis_name)
        meansq = _sync(ss[0] / n, cfg.axis_name)
        var = jnp.maximum(meansq - jnp.square(mean), 0.0)
        stats.append((mean, var))
        saved.append(y)
        cur = y
        a = scales[k + 1] * jax.lax.rsqrt(var + cfg.eps)
        b = biases[k + 1] - mean * a

    if cfg.pool:
        out = _pool_fwd(cur.reshape(B * M, S, -1), a, b).reshape(B, M, -1)
    else:
        out = _affine_fwd(cur, a, b).reshape(B, M, S, -1)
    return out, tuple(stats), saved


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_chain_train(cfg: ChainConfig, x, denses, scales, biases):
    """Training-mode fused chain.

    x: (B, M, S, C0) pre-BN_0 activations; denses: tuple of (W, bias);
    scales/biases: BN gamma/beta for BN_0..BN_D.
    Returns (out, stats): out is (B, M, C_D) when cfg.pool else
    (B, M, S, C_D); stats is a tuple of (mean, var) per BN (f32),
    cross-replica synced when cfg.axis_name is set. No gradient flows
    through stats (they feed the running-average update only, matching the
    reference's untrained moving stats, utils/tf_util.py:512-531).
    """
    out, stats, _ = _chain_fwd_impl(cfg, x, denses, scales, biases)
    return out, stats


def _fused_chain_fwd(cfg, x, denses, scales, biases):
    out, stats, saved = _chain_fwd_impl(cfg, x, denses, scales, biases)
    return (out, stats), (x.shape, saved, stats, denses, scales, biases)


def _fused_chain_bwd(cfg, res, cts):
    g_out, _ = cts  # stats carry no gradient
    (B, M, S, C0), saved, stats, denses, scales, biases = res
    n = B * M * S
    D = len(denses)

    packs = []
    for j in range(D + 1):
        mean, var = stats[j]
        packs.append((scales[j], biases[j], mean, var))

    def pack_with_means(j, t1, t2):
        scale, bias, mean, var = packs[j]
        # pmean(T)/n_local == global_sum/(n_local*ndev) == the global mean
        # the BN backward correction terms need (matching the forward's
        # pmean'd statistics).
        m1 = _sync(t1[0], cfg.axis_name) / n
        m2 = _sync(t2[0], cfg.axis_name) / n
        return _bn_pack(scale, bias, mean, var, cfg.eps, m1, m2)

    def pack_plain(j):
        scale, bias, mean, var = packs[j]
        return _bn_pack(scale, bias, mean, var, cfg.eps)

    d_scales = [None] * (D + 1)
    d_biases = [None] * (D + 1)
    d_denses = [None] * D

    # top BN reduction totals
    yD = saved[D]
    if cfg.pool:
        y_top = yD.reshape(B * M, S, -1)
        g_top = g_out.reshape(B * M, -1)
    else:
        y_top = yD
        g_top = g_out.reshape(yD.shape)
    t1, t2 = _top_stats(y_top, g_top, pack_plain(D), pool=cfg.pool)
    d_biases[D] = t1[0]
    d_scales[D] = t2[0]

    g = g_top
    top = True
    for k in range(D, 0, -1):
        w, _ = denses[k - 1]
        pk = pack_with_means(k, t1, t2)
        yk = saved[k].reshape(B * M, S, -1) if (top and cfg.pool) \
            else saved[k]
        g, dw, db, t1, t2 = _dense_bwd(
            yk, saved[k - 1], g, pk, pack_plain(k - 1), w,
            top_pool=(top and cfg.pool))
        d_denses[k - 1] = (dw, db[0])
        d_biases[k - 1] = t1[0]
        d_scales[k - 1] = t2[0]
        top = False

    dx = _first_bwd(saved[0], g, pack_with_means(0, t1, t2))
    return (dx.reshape(B, M, S, C0), tuple(d_denses), tuple(d_scales),
            tuple(d_biases))


fused_chain_train.defvjp(_fused_chain_fwd, _fused_chain_bwd)


def fused_chain_eval(cfg: ChainConfig, x, denses, scales, biases, running):
    """Inference-mode fused chain (running statistics; forward only).

    running: tuple of (mean, var) per BN. Not differentiable — eval/vote
    inference never takes gradients.
    """
    B, M, S, C0 = x.shape
    cur = x.reshape(B * M * S, C0)
    mean, var = running[0]
    a = scales[0] * jax.lax.rsqrt(var + cfg.eps)
    b = biases[0] - mean * a
    for k, (w, bias) in enumerate(denses):
        cur, _, _ = _dense_fwd(cur, a, b, w, bias, want_stats=False)
        mean, var = running[k + 1]
        a = scales[k + 1] * jax.lax.rsqrt(var + cfg.eps)
        b = biases[k + 1] - mean * a
    if cfg.pool:
        return _pool_fwd(cur.reshape(B * M, S, -1), a, b).reshape(B, M, -1)
    return _affine_fwd(cur, a, b).reshape(B, M, S, -1)


def fused_chain_eligible(x_shape, dtype, n_dense: int) -> bool:
    """Whether the fused kernels handle this chain configuration.

    Requires >=1 dense layer, a 4-D (B, M, S, C) input whose row count has
    a power-of-two factor >= 16 (exact-divisor tiles, no masking), and a
    float dtype. All real model configurations qualify; odd test shapes
    fall back to the unfused path.
    """
    if n_dense < 1 or len(x_shape) != 4:
        return False
    if dtype not in (jnp.float32, jnp.bfloat16):
        return False
    B, M, S, C = x_shape
    rows = B * M * S
    return (rows & (-rows)) >= 16 and (M * S) % 2 == 0
