"""Stage-by-stage timing of the flagship train step (pointnet2_cls_ssg).

Times each pipeline stage at the headline bench shapes (B=32, N=1024) with
the on-device loop methodology (utils/profiling.time_op_loop), so we can
see which component bounds the 'clouds/sec/chip' metric.

Run: python benchmarks/step_breakdown.py
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from pointnet2_tpu.models import MODEL_REGISTRY
from pointnet2_tpu.ops import (
    farthest_point_sample,
    gather_point,
    group_point,
    query_ball_point,
)
from pointnet2_tpu.data import augment_jax
from pointnet2_tpu.train.schedules import (
    bn_momentum_schedule,
    exponential_decay_clipped,
)
from pointnet2_tpu.train.state import TrainState, make_optimizer
from pointnet2_tpu.train.steps import make_train_step
from pointnet2_tpu.utils.profiling import time_op_loop

B, N = 32, 1024


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="model compute dtype (bench.py headline is bfloat16)")
    args = ap.parse_args()
    dtype = jnp.dtype(args.dtype)
    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.rand(B, N, 3).astype(np.float32))
    label = jnp.asarray(rng.randint(0, 40, (B,)).astype(np.int32))
    res = {}

    # --- op-level, at SA1/SA2 shapes ---
    res["fps_1024_512"] = time_op_loop(
        lambda x: farthest_point_sample(x, 512), xyz, iters=50) * 1e3
    new_xyz = gather_point(xyz, farthest_point_sample(xyz, 512))
    res["ballq_sa1"] = time_op_loop(
        lambda x: query_ball_point(0.2, 32, x, new_xyz)[0], xyz, iters=50) * 1e3
    idx1 = query_ball_point(0.2, 32, xyz, new_xyz)[0]
    res["group_sa1_xyz_c3"] = time_op_loop(
        lambda x: group_point(x, idx1), xyz, iters=50) * 1e3

    xyz2 = new_xyz
    feat2 = jnp.asarray(rng.rand(B, 512, 128).astype(np.float32))
    res["fps_512_128"] = time_op_loop(
        lambda x: farthest_point_sample(x, 128), xyz2, iters=50) * 1e3
    new_xyz2 = gather_point(xyz2, farthest_point_sample(xyz2, 128))
    res["ballq_sa2"] = time_op_loop(
        lambda x: query_ball_point(0.4, 64, x, new_xyz2)[0], xyz2,
        iters=50) * 1e3
    idx2 = query_ball_point(0.4, 64, xyz2, new_xyz2)[0]
    res["group_sa2_feat_c128"] = time_op_loop(
        lambda f: group_point(f, idx2), feat2, iters=50) * 1e3

    res["augment_cls"] = time_op_loop(
        lambda x: augment_jax.augment_cls(jax.random.PRNGKey(0), x), xyz,
        iters=50) * 1e3

    # --- model level ---
    spec = MODEL_REGISTRY["pointnet2_cls_ssg"]
    model = spec.cls(dtype=dtype)
    variables = jax.jit(lambda r, p: model.init(r, p, train=False))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        xyz)

    def fwd(x):
        logits, _ = model.apply(variables, x, train=False)
        return logits

    res["forward_eval"] = time_op_loop(fwd, xyz, iters=30) * 1e3

    def loss_of(params, x):
        (logits, _), mut = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, bn_momentum=0.9,
            rngs={"dropout": jax.random.PRNGKey(2)},
            mutable=["batch_stats"])
        return spec.loss(logits, label), logits

    def vag(x):
        # return the grads too: time_op_loop folds the FULL output, and a
        # loss-only return lets XLA dead-code-eliminate the whole backward
        # pass (the loss depends only on the forward)
        (l, _), g = jax.value_and_grad(loss_of, has_aux=True)(
            variables["params"], x)
        return l, g

    res["fwd_bwd"] = time_op_loop(vag, xyz, iters=30) * 1e3

    # --- full train step (as bench.py runs it, minus sharding machinery) ---
    lr = exponential_decay_clipped(1e-3, B, 200000, 0.7)
    tx = make_optimizer("adam", lr)
    bn_fn = bn_momentum_schedule(B, 200000)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=tx.init(variables["params"]))
    step = make_train_step(model, spec.loss, tx, bn_fn, task="cls",
                           mesh=None, augment="cls")
    batch = {"points": xyz, "label": label}

    def full(x):
        s2, metrics = step(state, dict(batch, points=x),
                           jax.random.PRNGKey(7))
        # fold the updated state as well: metrics alone would DCE the
        # backward pass and optimizer update
        return metrics["loss"], s2.params, s2.opt_state

    res["full_step"] = time_op_loop(full, xyz, iters=30) * 1e3

    print(json.dumps({k: round(v, 3) for k, v in res.items()}, indent=1))


if __name__ == "__main__":
    main()
