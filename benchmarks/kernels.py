"""Per-kernel microbenchmarks: Pallas vs pure-XLA reference, with roofline
context.

TPU-native replacement for the reference's standalone CUDA harnesses
(tf_ops/grouping/test/*.cu, compile.sh) and the op-wrapper __main__ timing
loops. Kernels are timed inside an on-device fori_loop (see
profiling.time_op_loop) because per-call timing over a remote-device
transport measures the transport, not the kernel. A known-FLOPs matmul is
included to calibrate the methodology against MXU peak.

Run on the real chip:
    python benchmarks/kernels.py [--batch 16] [--n 1024] [--json]
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from pointnet2_tpu.ops import farthest_point_sample, query_ball_point, three_nn
from pointnet2_tpu.ops.grouping import group_point, knn_point
from pointnet2_tpu.utils.profiling import time_op_loop

from pointnet2_tpu.utils.profiling import MXU_BF16_TFLOPS

# v5e single-chip peaks for roofline context
HBM_GBPS = 819.0
VPU_TOPS = 3.8  # rough elementwise f32 Telem-ops/s


def bench_matmul(results, n=4096):
    a32 = jnp.asarray(np.random.RandomState(0).rand(n, n), jnp.float32)
    t = time_op_loop(lambda x: x @ x, a32, iters=100)
    results["matmul_f32_4k"] = {"ms": t * 1e3,
                                "tflops": 2 * n ** 3 / t / 1e12}
    a16 = a32.astype(jnp.bfloat16)
    t = time_op_loop(lambda x: x @ x, a16, iters=100)
    results["matmul_bf16_4k"] = {"ms": t * 1e3,
                                 "tflops": 2 * n ** 3 / t / 1e12,
                                 "mxu_frac": 2 * n ** 3 / t / 1e12
                                 / MXU_BF16_TFLOPS}


def bench_fps(B, N, M, results):
    xyz = jnp.asarray(np.random.RandomState(0).rand(B, N, 3), jnp.float32)
    for impl in ("xla", "pallas"):
        t = time_op_loop(
            lambda x: farthest_point_sample(x, M, impl=impl), xyz, iters=100)
        # sequential min-dist updates: M passes over B*N points, ~8 ops each
        work = B * N * M * 8
        results[f"fps_{impl}"] = {
            "ms": t * 1e3,
            "vpu_frac": work / t / (VPU_TOPS * 1e12),
        }


def bench_ball_query(B, N, M, nsample, radius, results):
    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.rand(B, N, 3), jnp.float32)
    new_xyz = jnp.asarray(rng.rand(B, M, 3), jnp.float32)
    for impl in ("xla", "pallas"):
        t = time_op_loop(
            lambda x: query_ball_point(radius, nsample, x, new_xyz,
                                       impl=impl), xyz, iters=100)
        work = B * M * N * (9 + nsample)
        results[f"ball_query_{impl}"] = {
            "ms": t * 1e3,
            "vpu_frac": work / t / (VPU_TOPS * 1e12),
        }


def bench_group_point(B, N, M, nsample, C, results):
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.rand(B, N, C), jnp.float32)
    idx = jnp.asarray(rng.randint(0, N, (B, M, nsample)), jnp.int32)
    t = time_op_loop(lambda p: group_point(p, idx), pts, iters=100)
    bytes_moved = B * M * nsample * C * 4 * 2  # gather write + random read
    results["group_point"] = {
        "ms": t * 1e3,
        "gbps": bytes_moved / t / 1e9,
        "hbm_frac": bytes_moved / t / (HBM_GBPS * 1e9),
    }


def bench_three_nn(B, N, M, results):
    rng = np.random.RandomState(0)
    dense = jnp.asarray(rng.rand(B, N, 3), jnp.float32)
    sparse = jnp.asarray(rng.rand(B, M, 3), jnp.float32)
    for impl in ("xla", "pallas"):
        t = time_op_loop(lambda d, impl=impl: three_nn(d, sparse, impl=impl),
                         dense, iters=100)
        results[f"three_nn_{impl}"] = {"ms": t * 1e3}


def bench_knn(B, N, M, k, results):
    rng = np.random.RandomState(0)
    xyz1 = jnp.asarray(rng.rand(B, N, 3), jnp.float32)
    xyz2 = jnp.asarray(rng.rand(B, M, 3), jnp.float32)
    t = time_op_loop(lambda a: knn_point(k, a, xyz2), xyz1, iters=100)
    results["knn"] = {"ms": t * 1e3}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--m", type=int, default=512)
    ap.add_argument("--nsample", type=int, default=32)
    ap.add_argument("--radius", type=float, default=0.2)
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--skip-matmul", action="store_true")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    results = {"config": vars(args), "backend": jax.default_backend()}
    if not args.skip_matmul:
        bench_matmul(results)
    bench_fps(args.batch, args.n, args.m, results)
    bench_ball_query(args.batch, args.n, args.m, args.nsample, args.radius,
                     results)
    bench_group_point(args.batch, args.n, args.m, args.nsample,
                      args.channels, results)
    bench_three_nn(args.batch, args.n, args.m, results)
    bench_knn(args.batch, args.n, args.m, 3, results)

    if args.json:
        print(json.dumps(results))
    else:
        for k, v in results.items():
            if isinstance(v, dict):
                print(k, {kk: round(vv, 4) if isinstance(vv, float) else vv
                          for kk, vv in v.items()})
            else:
                print(k, v)


if __name__ == "__main__":
    main()
