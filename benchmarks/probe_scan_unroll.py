"""On-chip probe: does unrolling the K-step train scan recover the gap
between the scan-free single step (~9.1-9.5 ms, benchmarks/models.py) and
the 25-step-scan headline (~9.8-9.9 ms/step, bench.py)? The hypothesis:
the while-loop body pays per-iteration carry copies / dynamic-slice
overhead that partial unrolling amortizes. lax.scan(unroll=U) replicates
the body U times per while iteration; unroll=K removes the loop entirely.
Run: python benchmarks/probe_scan_unroll.py"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from pointnet2_tpu.models import MODEL_REGISTRY
from pointnet2_tpu.train.schedules import (
    bn_momentum_schedule,
    exponential_decay_clipped,
)
from pointnet2_tpu.train.state import TrainState, make_optimizer
from pointnet2_tpu.train.steps import make_train_multi_step

B, N, K = 32, 1024, 25


def main():
    rng = np.random.RandomState(0)
    spec = MODEL_REGISTRY["pointnet2_cls_ssg"]
    model = spec.cls(dtype=jnp.bfloat16)
    pts1 = jnp.asarray(rng.rand(B, N, 3).astype(np.float32))
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
    batches = {"points": ptsK, "label": lblK}
    res = {}

    for unroll in (1, 5, 25):
        mstep = make_train_multi_step(model, spec.loss, tx, bn_fn,
                                      task="cls", augment="cls",
                                      unroll=unroll)
        st = jax.tree_util.tree_map(jnp.copy, state0)
        key = jax.random.PRNGKey(0)
        t0 = time.perf_counter()
        for _ in range(2):  # warmup (includes compile)
            key, sub = jax.random.split(key)
            st, m = mstep(st, batches, sub)
        float(m["loss"][-1])
        res[f"unroll{unroll}_warm_s"] = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        calls = 6
        for _ in range(calls):
            key, sub = jax.random.split(key)
            st, m = mstep(st, batches, sub)
        float(m["loss"][-1])
        dt = time.perf_counter() - t0
        res[f"unroll{unroll}_ms_per_step"] = round(dt / (calls * K) * 1e3, 3)
        print(f"unroll={unroll}: {res[f'unroll{unroll}_ms_per_step']} "
              f"ms/step (warmup+compile {res[f'unroll{unroll}_warm_s']} s)",
              flush=True)

    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
