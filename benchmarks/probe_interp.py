"""On-chip probe: three_nn / three_interpolate implementations at the
sem-seg FP4 shape (B=16, N=8192, M=1024, C=128), plus the FP module
fused-vs-unfused A/B. Run: python benchmarks/probe_interp.py"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from pointnet2_tpu.nn.pointnet import FeaturePropagation
from pointnet2_tpu.ops import three_interpolate, three_nn
from pointnet2_tpu.utils.profiling import time_op_loop

B, N, M, C = 16, 8192, 1024, 128


def main():
    rng = np.random.RandomState(0)
    xyz1 = jnp.asarray(rng.rand(B, N, 3).astype(np.float32))
    xyz2 = jnp.asarray(rng.rand(B, M, 3).astype(np.float32))
    res = {}

    for impl in ("xla", "pallas"):
        res[f"three_nn_{impl}"] = round(time_op_loop(
            lambda a: three_nn(a, xyz2, impl=impl)[0], xyz1, iters=30) * 1e3, 3)
        print(f"three_nn_{impl}", res[f"three_nn_{impl}"], flush=True)
    # correctness on chip
    dx, ix = three_nn(xyz1, xyz2, impl="xla")
    dp, ip = three_nn(xyz1, xyz2, impl="pallas")
    res["three_nn_idx_match"] = bool(jnp.all(ix == ip))
    res["three_nn_dist_err"] = float(jnp.max(jnp.abs(dx - dp)))

    d = jnp.maximum(dx, 1e-10)
    w = (1.0 / d) / jnp.sum(1.0 / d, axis=2, keepdims=True)
    for dt in (jnp.float32, jnp.bfloat16):
        p2 = jnp.asarray(rng.rand(B, M, C).astype(np.float32)).astype(dt)
        for impl in ("xla", "mxu"):
            key = f"interp_fwd_{impl}_{dt.__name__}"
            res[key] = round(time_op_loop(
                lambda p: three_interpolate(p, ix, w, impl=impl), p2,
                iters=30) * 1e3, 3)
            # fwd+bwd (squared so the cotangent depends on p — a plain
            # sum's grad is input-independent and hoists out of the loop)
            def vag(p, impl=impl):
                return jax.grad(lambda q: jnp.sum(jnp.square(
                    three_interpolate(q, ix, w, impl=impl)
                    .astype(jnp.float32))))(p)
            res[key.replace("fwd", "bwd")] = round(time_op_loop(
                vag, p2, iters=30) * 1e3, 3)
            print(key, res[key], res[key.replace("fwd", "bwd")], flush=True)
        a = three_interpolate(p2, ix, w, impl="xla").astype(jnp.float32)
        b = three_interpolate(p2, ix, w, impl="mxu").astype(jnp.float32)
        res[f"interp_err_{dt.__name__}"] = float(jnp.max(jnp.abs(a - b)))

    # FP module A/B at the fp4 config
    p2f = jnp.asarray(rng.rand(B, M, C).astype(np.float32))
    for fuse in (True, False):
        fp = FeaturePropagation((128, 128, 128), dtype=jnp.bfloat16,
                                fuse_first=fuse)
        v = jax.jit(lambda a, b, c: fp.init(jax.random.PRNGKey(0), a, b,
                                            None, c, train=False))(
            xyz1, xyz2, p2f)

        def bwd(p, fp=fp, v=v):
            def loss(params, p):
                out, _ = fp.apply(
                    {"params": params, "batch_stats": v["batch_stats"]},
                    xyz1, xyz2, None, p, train=True,
                    mutable=["batch_stats"])
                return jnp.sum(out.astype(jnp.float32))
            return jax.grad(loss, argnums=(0, 1))(v["params"], p)

        key = f"fp4_fused{int(fuse)}"
        res[key + "_fwd"] = round(time_op_loop(
            lambda p: fp.apply(v, xyz1, xyz2, None, p, train=False), p2f,
            iters=30) * 1e3, 3)
        res[key + "_bwd"] = round(time_op_loop(bwd, p2f, iters=30) * 1e3, 3)
        print(key, res[key + "_fwd"], res[key + "_bwd"], flush=True)

    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
