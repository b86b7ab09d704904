"""On-chip probe: lifted-first-dense vs plain SA layouts per layer shape.

The lifted layout replaces a narrow C=3 gather with an mlp[0]-wide one-hot
matmul — a win when features ride along (the gather had to move them
anyway), but for points=None layers the plain path's fused Pallas
ball-query kernel extracts the 3 coordinates during the query, so lifting
buys nothing and pays a (K, N) one-hot contraction + its scatter-grad
(3.8 + 3.4 ms at the sem-seg sa1 shape). This probe measures both layouts
per representative layer. Run: python benchmarks/probe_sa_fuse.py"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from pointnet2_tpu.nn.pointnet import SetAbstraction, SetAbstractionMSG
from pointnet2_tpu.utils.profiling import time_op_loop

# (tag, B, N, C_points, SA kwargs)
SA_CASES = [
    ("semseg_sa1", 16, 8192, 0,
     dict(npoint=1024, radius=0.1, nsample=32, mlp=(32, 32, 64))),
    ("cls_sa1", 32, 1024, 0,
     dict(npoint=512, radius=0.2, nsample=32, mlp=(64, 64, 128))),
    ("cls_sa2", 32, 512, 128,
     dict(npoint=128, radius=0.4, nsample=64, mlp=(128, 128, 256))),
    ("partseg_sa1", 16, 2048, 3,
     dict(npoint=512, radius=0.2, nsample=32, mlp=(64, 64, 128))),
]


def bench_module(mod_fused, mod_plain, xyz, pts, res, tag):
    for name, mod in (("fused", mod_fused), ("plain", mod_plain)):
        v = jax.jit(lambda x: mod.init(jax.random.PRNGKey(0), x, pts,
                                       train=False))(xyz)

        def fwd(x, mod=mod, v=v):
            out = mod.apply(v, x, pts, train=False)
            return out[1]

        def bwd(x, mod=mod, v=v):
            def loss(params, x):
                out, _ = mod.apply(
                    {"params": params, "batch_stats": v["batch_stats"]}, x,
                    pts, train=True, mutable=["batch_stats"])
                return jnp.sum(jnp.square(out[1].astype(jnp.float32)))
            return jax.grad(loss, argnums=(0, 1))(v["params"], x)

        key = f"{tag}_{name}"
        res[key] = {
            "fwd_ms": round(time_op_loop(fwd, xyz, iters=30) * 1e3, 3),
            "fwd_bwd_ms": round(time_op_loop(bwd, xyz, iters=30) * 1e3, 3),
        }
        print(key, json.dumps(res[key]), flush=True)


def main():
    rng = np.random.RandomState(0)
    res = {}
    for tag, B, N, C, kw in SA_CASES:
        xyz = jnp.asarray(rng.rand(B, N, 3).astype(np.float32))
        pts = (jnp.asarray(rng.rand(B, N, C).astype(np.float32)).astype(
            jnp.bfloat16) if C else None)
        bench_module(
            SetAbstraction(dtype=jnp.bfloat16, fuse_first=True, **kw),
            SetAbstraction(dtype=jnp.bfloat16, fuse_first=False, **kw),
            xyz, pts, res, tag)

    # MSG-5k paper-recipe first layer (normals ride along)
    xyz = jnp.asarray(rng.rand(8, 5000, 3).astype(np.float32))
    pts = jnp.asarray(rng.rand(8, 5000, 3).astype(np.float32)).astype(
        jnp.bfloat16)
    kw = dict(npoint=512, radius_list=(0.1, 0.2, 0.4),
              nsample_list=(128, 128, 128),
              mlp_list=((32, 32, 64), (64, 64, 128), (64, 96, 128)))
    bench_module(
        SetAbstractionMSG(dtype=jnp.bfloat16, fuse_first=True, **kw),
        SetAbstractionMSG(dtype=jnp.bfloat16, fuse_first=False, **kw),
        xyz, pts, res, "msg5k_sa1")

    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
