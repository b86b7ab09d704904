"""Data-parallel scaling benchmark: step time vs mesh size.

Measures the full jit(shard_map(train_step)) at a fixed per-device batch
(weak scaling) across mesh sizes, reporting throughput and efficiency vs
the 1-device run. On a CPU host this validates the program structure on
virtual devices (XLA_FLAGS=--xla_force_host_platform_device_count=8); on
real hardware the same script measures ICI/DCN scaling — the BASELINE
target is >90% efficiency at 8 hosts.

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/scaling.py --per_device_batch 4 --num_point 256
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def measure(n_devices: int, per_device_batch: int, num_point: int,
            steps: int = 10) -> float:
    from pointnet2_tpu.models import MODEL_REGISTRY
    from pointnet2_tpu.parallel.mesh import (
        make_mesh,
        replicated_sharding,
        shard_batch,
    )
    from pointnet2_tpu.train.schedules import (
        bn_momentum_schedule,
        exponential_decay_clipped,
    )
    from pointnet2_tpu.train.state import TrainState, make_optimizer
    from pointnet2_tpu.train.steps import make_train_step

    mesh = make_mesh(n_devices)
    B = per_device_batch * n_devices
    spec = MODEL_REGISTRY["pointnet2_cls_ssg"]
    model = spec.cls()
    rng = np.random.RandomState(0)
    batch = {"points": jnp.asarray(rng.rand(B, num_point, 3), jnp.float32),
             "label": jnp.asarray(rng.randint(0, 40, (B,)), jnp.int32)}
    variables = jax.jit(lambda r, p: model.init(r, p, train=False))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["points"])
    tx = make_optimizer("adam", exponential_decay_clipped(1e-3, B, 200000, 0.7))
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=tx.init(variables["params"]))
    state = jax.device_put(state, replicated_sharding(mesh))
    step = make_train_step(model, spec.loss, tx,
                           bn_momentum_schedule(B, 200000), task="cls",
                           mesh=mesh, augment="cls")
    db = shard_batch(mesh, batch)
    key = jax.random.PRNGKey(0)
    for _ in range(3):
        key, sub = jax.random.split(key)
        state, metrics = step(state, db, sub)
    float(metrics["loss"])  # fence
    t0 = time.perf_counter()
    for _ in range(steps):
        key, sub = jax.random.split(key)
        state, metrics = step(state, db, sub)
    float(metrics["loss"])  # fence
    dt = time.perf_counter() - t0
    return B * steps / dt  # examples/sec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--per_device_batch", type=int, default=4)
    ap.add_argument("--num_point", type=int, default=256)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--sizes", type=int, nargs="*", default=None)
    args = ap.parse_args()

    n_avail = len(jax.devices())
    sizes = args.sizes or [n for n in (1, 2, 4, 8, 16, 32) if n <= n_avail]
    results = {}
    base_per_dev = None
    for n in sizes:
        ex_s = measure(n, args.per_device_batch, args.num_point, args.steps)
        per_dev = ex_s / n
        if base_per_dev is None:
            base_per_dev = per_dev
            base_n = n
        results[str(n)] = {
            "examples_per_sec": round(ex_s, 1),
            "per_device": round(per_dev, 1),
            # efficiency vs the SMALLEST measured mesh — only a true
            # 1-device baseline makes this the textbook scaling number
            "efficiency": round(per_dev / base_per_dev, 3),
            "efficiency_baseline_devices": base_n,
        }
        print(f"devices={n:3d}  {ex_s:10.1f} ex/s  "
              f"eff={per_dev / base_per_dev:.3f}", flush=True)
    print(json.dumps({"scaling": results, "backend": jax.default_backend()}))


if __name__ == "__main__":
    main()
