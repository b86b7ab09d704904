"""Ad-hoc probe: where does the backward pass spend its time?

Times value_and_grad of each SA stage of pointnet2_cls_ssg in isolation
(bf16), plus the full model, so the unaccounted backward cost is localized.
Run: python benchmarks/probe_bwd.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from pointnet2_tpu.models import MODEL_REGISTRY
from pointnet2_tpu.nn.pointnet import SetAbstraction
from pointnet2_tpu.utils.profiling import time_op_loop

B, N = 32, 1024
DT = jnp.bfloat16


def stage(name, mod, xyz, points, res):
    variables = jax.jit(lambda r: mod.init(
        r, xyz, points, train=False))(jax.random.PRNGKey(0))

    def fwd(x):
        out = mod.apply(variables, x, points, train=False)
        return out[1]

    res[f"{name}_fwd"] = time_op_loop(fwd, xyz, iters=30) * 1e3

    def loss(params, x):
        (_, new_points, _), _ = mod.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, points, train=True, bn_momentum=0.9, mutable=["batch_stats"])
        return jnp.sum(new_points.astype(jnp.float32))

    def vag(x):
        l, g = jax.value_and_grad(loss)(variables["params"], x)
        return l, g

    res[f"{name}_fwd_bwd"] = time_op_loop(vag, xyz, iters=30) * 1e3


def main():
    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.rand(B, N, 3).astype(np.float32))
    res = {}

    sa1 = SetAbstraction(npoint=512, radius=0.2, nsample=32,
                         mlp=[64, 64, 128], dtype=DT)
    stage("sa1", sa1, xyz, None, res)

    xyz2 = jnp.asarray(rng.rand(B, 512, 3).astype(np.float32))
    pts2 = jnp.asarray(rng.rand(B, 512, 128).astype(np.float32)).astype(DT)
    sa2 = SetAbstraction(npoint=128, radius=0.4, nsample=64,
                         mlp=[128, 128, 256], dtype=DT)
    stage("sa2", sa2, xyz2, pts2, res)

    xyz3 = jnp.asarray(rng.rand(B, 128, 3).astype(np.float32))
    pts3 = jnp.asarray(rng.rand(B, 128, 256).astype(np.float32)).astype(DT)
    sa3 = SetAbstraction(npoint=None, radius=None, nsample=None,
                         mlp=[256, 512, 1024], group_all=True, dtype=DT)
    stage("sa3", sa3, xyz3, pts3, res)

    # full model for reference
    spec = MODEL_REGISTRY["pointnet2_cls_ssg"]
    model = spec.cls(dtype=DT)
    variables = jax.jit(lambda r, p: model.init(r, p, train=False))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        xyz)
    label = jnp.asarray(rng.randint(0, 40, (B,)).astype(np.int32))

    def loss_of(params, x):
        (logits, _), _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, bn_momentum=0.9,
            rngs={"dropout": jax.random.PRNGKey(2)},
            mutable=["batch_stats"])
        return spec.loss(logits, label)

    def vag(x):
        l, g = jax.value_and_grad(loss_of)(variables["params"], x)
        return l, g

    res["model_fwd_bwd"] = time_op_loop(vag, xyz, iters=30) * 1e3
    print(json.dumps({k: round(v, 3) for k, v in res.items()}, indent=1))


if __name__ == "__main__":
    main()
