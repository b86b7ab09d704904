"""On-chip probe: why does bench.py's 25-step scan run at ~10 ms/step when
the identical single step times at ~4.4 ms? Factors tested independently:
the lax.scan program, on-device augmentation, and the donation/copy
pattern. Run: python benchmarks/probe_step_gap.py"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from pointnet2_tpu.models import MODEL_REGISTRY
from pointnet2_tpu.data import augment_jax
from pointnet2_tpu.train.schedules import (
    bn_momentum_schedule,
    exponential_decay_clipped,
)
from pointnet2_tpu.train.state import TrainState, make_optimizer
from pointnet2_tpu.train.steps import make_train_multi_step, make_train_step
from pointnet2_tpu.utils.profiling import time_op_loop

B, N, K = 32, 1024, 25


def main():
    rng = np.random.RandomState(0)
    spec = MODEL_REGISTRY["pointnet2_cls_ssg"]
    model = spec.cls(dtype=jnp.bfloat16)
    pts1 = jnp.asarray(rng.rand(B, N, 3).astype(np.float32))
    lbl1 = jnp.asarray(rng.randint(0, 40, (B,)).astype(np.int32))
    ptsK = jnp.asarray(rng.rand(K, B, N, 3).astype(np.float32))
    lblK = jnp.asarray(rng.randint(0, 40, (K, B)).astype(np.int32))
    variables = jax.jit(lambda r, p: model.init(r, p, train=False))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        pts1)
    tx = make_optimizer("adam", exponential_decay_clipped(1e-3, B, 200000,
                                                          0.7))
    bn_fn = bn_momentum_schedule(B, 200000)
    state0 = TrainState(step=jnp.zeros((), jnp.int32),
                        params=variables["params"],
                        batch_stats=variables["batch_stats"],
                        opt_state=tx.init(variables["params"]))
    res = {}

    # raw augmentation cost at the batch shape
    res["augment_cls_ms"] = round(time_op_loop(
        lambda p: augment_jax.augment_cls(jax.random.PRNGKey(0), p), pts1,
        iters=50) * 1e3, 3)
    print("augment_cls_ms", res["augment_cls_ms"], flush=True)

    # single-step program, augment on/off (loop-timed, state copied per
    # iter like probe_remat)
    for aug in ("none", "cls"):
        step = make_train_step(model, spec.loss, tx, bn_fn, task="cls",
                               augment=aug)

        # return the updated state too — a loss-only return DCEs the whole
        # backward + optimizer and times forward-only
        def op(p, step=step):
            st = jax.tree_util.tree_map(jnp.copy, state0)
            st2, m = step(st, {"points": p, "label": lbl1},
                          jax.random.PRNGKey(7))
            return m["loss"], st2.params, st2.opt_state

        key = f"single_{aug}_ms"
        res[key] = round(time_op_loop(op, pts1, iters=20) * 1e3, 3)
        print(key, res[key], flush=True)

    # the bench.py execution pattern: chained dispatches of the K-step scan
    for aug in ("none", "cls"):
        mstep = make_train_multi_step(model, spec.loss, tx, bn_fn,
                                      task="cls", augment=aug)
        batches = {"points": ptsK, "label": lblK}
        st = jax.tree_util.tree_map(jnp.copy, state0)
        key = jax.random.PRNGKey(0)
        for _ in range(2):  # warmup
            key, sub = jax.random.split(key)
            st, m = mstep(st, batches, sub)
        float(m["loss"][-1])
        t0 = time.perf_counter()
        calls = 4
        for _ in range(calls):
            key, sub = jax.random.split(key)
            st, m = mstep(st, batches, sub)
        float(m["loss"][-1])
        dt = time.perf_counter() - t0
        k2 = f"scan{K}_{aug}_ms_per_step"
        res[k2] = round(dt / (calls * K) * 1e3, 3)
        print(k2, res[k2], flush=True)

    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
