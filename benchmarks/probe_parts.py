"""Ad-hoc probe: time the flagship model's internal pieces at bench shapes.

Not part of the benchmark suite — a scratch tool for finding the next
bottleneck. Run: python benchmarks/probe_parts.py [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from pointnet2_tpu.ops import (
    farthest_point_sample,
    gather_point,
    group_point,
    max_pool,
    query_ball_point,
)
from pointnet2_tpu.utils.profiling import time_op_loop

B, N = 32, 1024


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    dt = jnp.dtype(args.dtype)
    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.rand(B, N, 3).astype(np.float32))
    res = {}

    fps1 = farthest_point_sample(xyz, 512)
    new_xyz = gather_point(xyz, fps1)
    idx1, _ = query_ball_point(0.2, 32, xyz, new_xyz)
    lifted1 = jnp.asarray(rng.rand(B, N, 64).astype(np.float32)).astype(dt)
    res["gather_sa1_c64_k16384"] = time_op_loop(
        lambda x: group_point(x, idx1), lifted1, iters=50) * 1e3

    xyz2 = new_xyz
    fps2 = farthest_point_sample(xyz2, 128)
    new_xyz2 = gather_point(xyz2, fps2)
    idx2, _ = query_ball_point(0.4, 64, xyz2, new_xyz2)
    lifted2 = jnp.asarray(rng.rand(B, 512, 128).astype(np.float32)).astype(dt)
    res["gather_sa2_c128_k8192"] = time_op_loop(
        lambda x: group_point(x, idx2), lifted2, iters=50) * 1e3

    # scatter (the VJPs of the two gathers)
    g1 = jnp.asarray(rng.rand(B, 512, 32, 64).astype(np.float32)).astype(dt)
    res["scatter_sa1"] = time_op_loop(
        lambda g: jax.vjp(lambda x: group_point(x, idx1), lifted1)[1](g)[0],
        g1, iters=50) * 1e3
    g2 = jnp.asarray(rng.rand(B, 128, 64, 128).astype(np.float32)).astype(dt)
    res["scatter_sa2"] = time_op_loop(
        lambda g: jax.vjp(lambda x: group_point(x, idx2), lifted2)[1](g)[0],
        g2, iters=50) * 1e3

    # BN+ReLU shaped work on the grouped tensors (fwd only, rough)
    t1 = jnp.asarray(rng.rand(B, 512, 32, 64).astype(np.float32)).astype(dt)

    def bnrelu(x):
        m = jnp.mean(x, axis=(0, 1, 2))
        v = jnp.var(x, axis=(0, 1, 2))
        return jax.nn.relu((x - m) / jnp.sqrt(v + 1e-3))

    res["bnrelu_sa1_tensor"] = time_op_loop(bnrelu, t1, iters=50) * 1e3
    res["maxpool_sa1"] = time_op_loop(
        lambda x: max_pool(x, 2), t1, iters=50) * 1e3

    # the three SA-stack dense chains as plain matmuls (what the MLPs cost)
    w = {
        "sa1_l2": (jnp.zeros((B * 512 * 32, 64), dt), jnp.zeros((64, 64), dt)),
        "sa1_l3": (jnp.zeros((B * 512 * 32, 64), dt), jnp.zeros((64, 128), dt)),
        "sa2_l2": (jnp.zeros((B * 128 * 64, 128), dt), jnp.zeros((128, 128), dt)),
        "sa2_l3": (jnp.zeros((B * 128 * 64, 128), dt), jnp.zeros((128, 256), dt)),
    }
    for k, (a, b) in list(w.items()):
        a = jnp.asarray(rng.rand(*a.shape).astype(np.float32)).astype(dt)
        bb = jnp.asarray(rng.rand(*b.shape).astype(np.float32)).astype(dt)
        res[f"mm_{k}"] = time_op_loop(
            lambda x, bb=bb: x @ bb, a, iters=50) * 1e3

    # FPS backward has no grad; ball query none. The fc head:
    fc_in = jnp.asarray(rng.rand(B, 1024).astype(np.float32)).astype(dt)
    w1 = jnp.asarray(rng.rand(1024, 512).astype(np.float32)).astype(dt)
    res["mm_fc1"] = time_op_loop(lambda x: x @ w1, fc_in, iters=50) * 1e3

    print(json.dumps({k: round(v, 3) for k, v in res.items()}, indent=1))


if __name__ == "__main__":
    main()
