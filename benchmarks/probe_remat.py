"""On-chip probe: backward-pass rematerialization policies on the train
step (VERDICT r3 item 2). The step is HBM-bandwidth bound; the saved wide
grouped activations dominate traffic, so recomputing them may eliminate
whole memory passes. Sweeps steps_body.REMAT_POLICIES on the cls_ssg
headline config and the sem_seg config. Run: python benchmarks/probe_remat.py"""

from __future__ import annotations

import json
import sys

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
from pointnet2_tpu.train.steps import make_train_step
from pointnet2_tpu.train.steps_body import REMAT_POLICIES
from pointnet2_tpu.utils.profiling import time_op_loop

CONFIGS = [
    ("pointnet2_cls_ssg", 32, 1024, 3, "cls"),
    ("pointnet2_sem_seg", 16, 8192, 3, "sem_seg"),
]


def main():
    rng = np.random.RandomState(0)
    res = {}
    for name, B, N, C, task in CONFIGS:
        spec = MODEL_REGISTRY[name]
        model = spec.cls(dtype=jnp.bfloat16)
        pts = jnp.asarray(rng.rand(B, N, C).astype(np.float32))
        batch = {"points": pts}
        if task == "cls":
            batch["label"] = jnp.asarray(
                rng.randint(0, 40, (B,)).astype(np.int32))
        else:
            batch["seg"] = jnp.asarray(
                rng.randint(0, 21, (B, N)).astype(np.int32))
            batch["smpw"] = jnp.ones((B, N), jnp.float32)
        variables = jax.jit(lambda r, p: model.init(r, p, train=False))(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)}, pts)
        tx = make_optimizer("adam", exponential_decay_clipped(
            1e-3, B, 200000, 0.7))
        state0 = TrainState(step=jnp.zeros((), jnp.int32),
                            params=variables["params"],
                            batch_stats=variables["batch_stats"],
                            opt_state=tx.init(variables["params"]))
        losses = {}
        for remat in REMAT_POLICIES:
            step = make_train_step(model, spec.loss, tx,
                                   bn_momentum_schedule(B, 200000),
                                   task=task, augment="none", remat=remat)

            # donate_argnums=0 forbids reusing state0 across timed calls;
            # time a (state, points)-varying closure instead. Return the
            # UPDATED STATE, not just the loss — a loss-only return lets
            # XLA dead-code-eliminate the whole backward + optimizer (the
            # first version of this probe measured forward-only).
            def op(p, step=step):
                st = jax.tree_util.tree_map(jnp.copy, state0)
                st2, m = step(st, dict(batch, points=p),
                              jax.random.PRNGKey(7))
                return m["loss"], st2.params, st2.opt_state

            t = round(time_op_loop(op, pts, iters=20) * 1e3, 3)
            st = jax.tree_util.tree_map(jnp.copy, state0)
            _, m = step(st, batch, jax.random.PRNGKey(7))
            losses[remat] = float(m["loss"])
            res[f"{name}_{remat}"] = {
                "step_ms": t, "clouds_per_sec": round(B / (t / 1e3), 1)}
            print(name, remat, json.dumps(res[f"{name}_{remat}"]), flush=True)
        base = losses["none"]
        for k, v in losses.items():
            # bf16 compilation differences across remat programs give
            # ~0.5%-class loss noise on TPU; parity is held bitwise on CPU
            assert abs(v - base) < 5e-2 * max(1.0, abs(base)), (k, v, base)
        res[f"{name}_losses"] = losses
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
