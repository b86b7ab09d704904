"""On-chip probe: where sa1 (sem_seg's 8192->1024 set abstraction) spends
its 15 ms fwd+bwd. Times each internal op at the exact sa1 shape, plus the
MSG-5k first layer's ball queries. Run: python benchmarks/probe_sa1.py"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from pointnet2_tpu.nn.pointnet import SetAbstraction
from pointnet2_tpu.ops import (
    farthest_point_sample,
    gather_point,
    group_point,
    query_ball_point,
)
from pointnet2_tpu.utils.profiling import time_op_loop

B, N, M, NS = 16, 8192, 1024, 32


def main():
    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.rand(B, N, 3).astype(np.float32))
    res = {}

    def t(key, fn, x, iters=30):
        res[key] = round(time_op_loop(fn, x, iters=iters) * 1e3, 3)
        print(key, res[key], flush=True)

    t("fps_8192_1024", lambda x: farthest_point_sample(x, M), xyz)
    fidx = farthest_point_sample(xyz, M)
    new_xyz = gather_point(xyz, fidx)
    for impl in ("pallas", "xla"):
        t(f"ballq_sa1_{impl}",
          lambda x, impl=impl: query_ball_point(0.1, NS, x, new_xyz,
                                                impl=impl)[0], xyz)
    idx = query_ball_point(0.1, NS, xyz, new_xyz)[0]
    lifted = jnp.asarray(rng.rand(B, N, 32).astype(np.float32)).astype(
        jnp.bfloat16)
    t("group_lifted_c32", lambda f: group_point(f, idx), lifted)

    # full sa1 module fwd / fwd+bwd (bf16 deployment config)
    sa = SetAbstraction(M, 0.1, NS, (32, 32, 64), dtype=jnp.bfloat16)
    v = jax.jit(lambda x: sa.init(jax.random.PRNGKey(0), x, None,
                                  train=False))(xyz)

    t("sa1_fwd", lambda x: sa.apply(v, x, None, train=False)[1], xyz)

    def bwd(x):
        def loss(params, x):
            (_, out, _), _ = sa.apply(
                {"params": params, "batch_stats": v["batch_stats"]}, x, None,
                train=True, mutable=["batch_stats"])
            return jnp.sum(out.astype(jnp.float32))
        return jax.grad(loss, argnums=(0, 1))(v["params"], x)

    t("sa1_fwd_bwd", bwd, xyz)

    # MSG-5k first layer (paper recipe): 3 radii, nsample=128, 5000 pts B=8
    xyz5k = jnp.asarray(rng.rand(8, 5000, 3).astype(np.float32))
    nxyz5k = gather_point(xyz5k, farthest_point_sample(xyz5k, 512))
    t("fps_5000_512", lambda x: farthest_point_sample(x, 512), xyz5k)
    for r in (0.1, 0.2, 0.4):
        t(f"ballq_msg5k_r{r}",
          lambda x, r=r: query_ball_point(r, 128, x, nxyz5k)[0], xyz5k)

    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
