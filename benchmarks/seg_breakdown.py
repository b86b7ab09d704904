"""Stage-by-stage timing of the sem_seg train step (the decoder story).

The per-model table (benchmarks/models.py) shows pointnet2_sem_seg at
~455 GB/s apparent HBM — ~55% of the ~820 GB/s XLA-achievable ceiling this
repo measured — while cls_ssg runs at ~90%. This harness times every SA/FP
stage of the sem_seg architecture (models/pointnet2_sem_seg.py:28-55 in the
reference) standalone at its exact shape, fwd and fwd+bwd, with XLA
cost-model GB/s per stage, so the below-ceiling passes are identifiable.

Run: python benchmarks/seg_breakdown.py [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from pointnet2_tpu.nn.pointnet import FeaturePropagation, SetAbstraction
from pointnet2_tpu.ops import three_interpolate, three_nn
from pointnet2_tpu.utils.profiling import compiled_cost, time_op_loop

B = 16


def _stage_row(apply_fwd, apply_bwd, x, iters=30):
    fwd_s = max(time_op_loop(apply_fwd, x, iters=iters), 1e-5)
    bwd_s = max(time_op_loop(apply_bwd, x, iters=iters), 1e-5)
    row = {"fwd_ms": round(fwd_s * 1e3, 3),
           "fwd_bwd_ms": round(bwd_s * 1e3, 3)}
    cost = compiled_cost(jax.jit(apply_bwd), x)
    if cost is not None:
        row["train_hbm_gbps"] = round(cost["bytes_accessed"] / bwd_s / 1e9, 1)
        row["train_tflops"] = round(cost["flops"] / bwd_s / 1e12, 2)
    return row


def bench_sa(name, npoint, radius, nsample, mlp, N, C, dtype, rng, res):
    sa = SetAbstraction(npoint, radius, nsample, mlp, dtype=dtype)
    xyz = jnp.asarray(rng.rand(B, N, 3).astype(np.float32))
    pts = (jnp.asarray(rng.rand(B, N, C).astype(np.float32))
           if C else None)
    v = jax.jit(lambda x: sa.init(jax.random.PRNGKey(0), x, pts,
                                  train=False))(xyz)

    def fwd(x):
        _, out, _ = sa.apply(v, x, pts, train=False)
        return out

    def bwd(x):
        def loss(params, x):
            (_, out, _), _ = sa.apply(
                {"params": params, "batch_stats": v["batch_stats"]}, x, pts,
                train=True, mutable=["batch_stats"])
            return jnp.sum(out.astype(jnp.float32))
        return jax.grad(loss, argnums=(0, 1))(v["params"], x)

    res[name] = _stage_row(fwd, bwd, xyz)
    print(name, json.dumps(res[name]), flush=True)


def bench_fp(name, mlp, N, M, C1, C2, dtype, rng, res):
    fp = FeaturePropagation(mlp, dtype=dtype)
    xyz1 = jnp.asarray(rng.rand(B, N, 3).astype(np.float32))
    xyz2 = jnp.asarray(rng.rand(B, M, 3).astype(np.float32))
    p1 = (jnp.asarray(rng.rand(B, N, C1).astype(np.float32))
          if C1 else None)
    p2 = jnp.asarray(rng.rand(B, M, C2).astype(np.float32))
    v = jax.jit(lambda a, b, c: fp.init(jax.random.PRNGKey(0), a, b, p1, c,
                                        train=False))(xyz1, xyz2, p2)

    def fwd(p2_):
        return fp.apply(v, xyz1, xyz2, p1, p2_, train=False)

    def bwd(p2_):
        def loss(params, p2_):
            out, _ = fp.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                xyz1, xyz2, p1, p2_, train=True, mutable=["batch_stats"])
            return jnp.sum(out.astype(jnp.float32))
        return jax.grad(loss, argnums=(0, 1))(v["params"], p2_)

    res[name] = _stage_row(fwd, bwd, p2)
    print(name, json.dumps(res[name]), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    args = ap.parse_args()
    dtype = jnp.dtype(args.dtype)
    rng = np.random.RandomState(0)
    res = {}

    # encoder stages (models/pointnet2_sem_seg.py:28-38)
    bench_sa("sa1_8192_1024", 1024, 0.1, 32, (32, 32, 64), 8192, 0,
             dtype, rng, res)
    bench_sa("sa2_1024_256", 256, 0.2, 32, (64, 64, 128), 1024, 64,
             dtype, rng, res)
    bench_sa("sa3_256_64", 64, 0.4, 32, (128, 128, 256), 256, 128,
             dtype, rng, res)
    bench_sa("sa4_64_16", 16, 0.8, 32, (256, 256, 512), 64, 256,
             dtype, rng, res)

    # decoder stages (models/pointnet2_sem_seg.py:41-44)
    bench_fp("fp1_16_64", (256, 256), 64, 16, 256, 512, dtype, rng, res)
    bench_fp("fp2_64_256", (256, 256), 256, 64, 128, 256, dtype, rng, res)
    bench_fp("fp3_256_1024", (256, 128), 1024, 256, 64, 256, dtype, rng, res)
    bench_fp("fp4_1024_8192", (128, 128, 128), 8192, 1024, 0, 128,
             dtype, rng, res)

    # raw interpolation ops at the fp4 (widest) shape
    xyz1 = jnp.asarray(rng.rand(B, 8192, 3).astype(np.float32))
    xyz2 = jnp.asarray(rng.rand(B, 1024, 3).astype(np.float32))
    p2 = jnp.asarray(rng.rand(B, 1024, 128).astype(np.float32))
    res["three_nn_8192_1024"] = {"fwd_ms": round(time_op_loop(
        lambda a: three_nn(a, xyz2)[0], xyz1, iters=30) * 1e3, 3)}
    d, i3 = three_nn(xyz1, xyz2)
    w = 1.0 / jnp.maximum(d, 1e-10)
    w = w / w.sum(-1, keepdims=True)
    res["three_interp_8192_128"] = {"fwd_ms": round(time_op_loop(
        lambda p: three_interpolate(p, i3, w), p2, iters=30) * 1e3, 3)}
    for k in ("three_nn_8192_1024", "three_interp_8192_128"):
        print(k, json.dumps(res[k]), flush=True)

    total_fwd = sum(r["fwd_ms"] for k, r in res.items()
                    if k.startswith(("sa", "fp")))
    total_bwd = sum(r["fwd_bwd_ms"] for k, r in res.items()
                    if k.startswith(("sa", "fp")))
    res["_totals"] = {"stages_fwd_ms": round(total_fwd, 2),
                      "stages_fwd_bwd_ms": round(total_bwd, 2)}
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
