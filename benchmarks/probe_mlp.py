"""Ad-hoc probe: cost of the (dense+BN+ReLU)x3 + maxpool chain in isolation.

Confirms how much of the SA backward is HBM-bound elementwise/BN work
(vs matmuls/gathers). Run: python benchmarks/probe_mlp.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from pointnet2_tpu.nn.layers import SharedMLP
from pointnet2_tpu.ops import max_pool
from pointnet2_tpu.utils.profiling import time_op_loop

DT = jnp.bfloat16


def chain(name, shape, feats, res):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(*shape).astype(np.float32)).astype(DT)
    mod = SharedMLP(feats, dtype=DT)
    variables = jax.jit(lambda r: mod.init(r, x, train=False))(
        jax.random.PRNGKey(0))

    def fwd_train(v):
        out, _ = mod.apply(variables, v, train=True, bn_momentum=0.9,
                           mutable=["batch_stats"])
        return max_pool(out, 2)

    res[f"{name}_fwd_train"] = time_op_loop(fwd_train, x, iters=30) * 1e3

    def loss(params, v):
        out, _ = mod.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            v, train=True, bn_momentum=0.9, mutable=["batch_stats"])
        return jnp.sum(max_pool(out, 2).astype(jnp.float32))

    def vag(v):
        l, g = jax.value_and_grad(loss)(variables["params"], v)
        return l, g

    res[f"{name}_fwd_bwd"] = time_op_loop(vag, x, iters=30) * 1e3


def main():
    res = {}
    chain("sa1_mlp", (32, 512, 32, 64), [64, 64, 128], res)
    chain("sa2_mlp", (32, 128, 64, 131), [128, 128, 256], res)
    print(json.dumps({k: round(v, 3) for k, v in res.items()}, indent=1))


if __name__ == "__main__":
    main()
