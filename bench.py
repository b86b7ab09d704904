"""Headline benchmark: pointnet2_cls_ssg training throughput, clouds/sec/chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Measures the full data-parallel train step (forward + backward + optimizer +
on-device augmentation) of the flagship classifier at the reference's
ModelNet40 configuration (1024 points, global batch 32) on the available
device(s), with the trainer's K-steps-per-dispatch execution so host
round-trip latency is amortized exactly as in real training
(Trainer steps_per_call / make_train_multi_step).

Runs in the TPU-native deployment configuration: bfloat16 activations with
float32 parameters, batch statistics, and loss (cli.train --dtype bfloat16).
Convergence parity is held by tests and re-verified on-chip after each
optimization of this path (most recently: a 40-epoch synthetic bf16 A/B of
the pool-before-affine SA tail, identical learning curves with it on/off;
earlier: bf16-vs-f32 parity after the ops/pooling.py index-routed VJP fix).

Baseline: the reference repo publishes no throughput numbers
(SURVEY.md §6). We anchor vs_baseline to an estimated 600 clouds/sec for the
reference TF1+CUDA trainer on its contemporaneous single GPU (batch 16,
~40 ms/step — consistent with community reports for pointnet2 training);
treat vs_baseline as an estimate against that fixed anchor, while `value`
(clouds/sec/chip) is the precise cross-round tracking metric.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_CLOUDS_PER_SEC = 600.0

# Roofline context (v5e single chip, benchmarks/kernels.py calibration):
# MFU is achieved flops / MXU bf16 peak; hbm_gbps is XLA's bytes-accessed
# estimate over wall time. The step is HBM-bandwidth-bound: ~19% MFU at
# ~740 GB/s, ~90% of the XLA-achievable bandwidth on this platform
# (docs/PERF.md roofline section; B-sweep in BENCH_SWEEP_r03.json shows
# throughput flat in batch, i.e. saturated at the reference's B=32).
from pointnet2_tpu.utils.profiling import MXU_BF16_TFLOPS  # chip bf16 peak

BATCH = 32
NPOINTS = 1024
STEPS_PER_CALL = 25  # scan K steps per dispatch (trainer steps_per_call)
WARMUP_CALLS = 2
MEASURE_CALLS = 4


def main() -> None:
    # The remote TPU session can wedge hard (client blocks in futex with
    # no exception — CLAUDE.md gotchas); fail fast with a message instead
    # of hanging the caller forever. 600 s >> worst-case first compile.
    import sys

    from pointnet2_tpu.train.watchdog import Watchdog

    partial_record: list = []  # set once the timing half has a result

    def _bail(rc):
        sys.stderr.write("bench.py: device made no progress — TPU session "
                         "wedged; retry after the transport recovers\n")
        import os
        if partial_record:  # timing succeeded; only cost analysis hung
            # "partial" makes the wedge observable downstream even though
            # the throughput half is valid (advisor r2).
            print(json.dumps({**partial_record[0], "partial": True}),
                  flush=True)
            os._exit(0)
        os._exit(rc)

    watchdog = Watchdog(timeout_s=600.0, label="bench",
                        log_fn=lambda m: None, _exit_fn=_bail)

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
    from pointnet2_tpu.train.steps import make_train_multi_step

    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    spec = MODEL_REGISTRY["pointnet2_cls_ssg"]
    model = spec.cls(dtype=jnp.bfloat16)

    rng = np.random.RandomState(0)
    # K distinct batches stacked along the scan axis (the trainer's
    # steps_per_call prefetch layout).
    batches = {
        "points": jnp.asarray(
            rng.rand(STEPS_PER_CALL, BATCH, NPOINTS, 3).astype(np.float32)),
        "label": jnp.asarray(
            rng.randint(0, 40, (STEPS_PER_CALL, BATCH)).astype(np.int32)),
    }
    variables = jax.jit(lambda r, p: model.init(r, p, train=False))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batches["points"][0])
    lr = exponential_decay_clipped(1e-3, BATCH, 200000, 0.7)
    tx = make_optimizer("adam", lr)
    bn_fn = bn_momentum_schedule(BATCH, 200000)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=tx.init(variables["params"]))
    state = jax.device_put(state, replicated_sharding(mesh))
    step = make_train_multi_step(model, spec.loss, tx, bn_fn, task="cls",
                                 mesh=mesh, augment="cls")
    device_batches = shard_batch(mesh, batches, stacked=True)
    key = jax.random.PRNGKey(0)

    # Dispatches chain through `state`, so fetching the last call's loss
    # fences the whole sequence. (On remote-device transports
    # block_until_ready can return early — only a result fetch is a
    # reliable fence.)
    for i in range(WARMUP_CALLS):
        key, sub = jax.random.split(key)
        state, metrics = step(state, device_batches, sub)
    float(metrics["loss"][-1])
    watchdog.beat()

    t0 = time.perf_counter()
    for i in range(MEASURE_CALLS):
        key, sub = jax.random.split(key)
        state, metrics = step(state, device_batches, sub)
    float(metrics["loss"][-1])
    dt = time.perf_counter() - t0
    watchdog.beat()

    clouds_per_sec = BATCH * STEPS_PER_CALL * MEASURE_CALLS / dt
    per_chip = clouds_per_sec / n_dev
    record = {
        "metric": "train_clouds_per_sec_per_chip",
        "value": round(per_chip, 2),
        "unit": "clouds/s/chip",
        "vs_baseline": round(per_chip / BASELINE_CLOUDS_PER_SEC, 3),
    }
    partial_record.append(record)

    from pointnet2_tpu.utils.profiling import compiled_cost
    cost = compiled_cost(step, state, device_batches, key)
    if cost is not None:
        # Assumption (advisor r2): cost_analysis() on this backend reports
        # the whole-program flops/bytes, so /n_dev gives per-chip numbers.
        # On the headline run n_dev=1 so the two conventions coincide; if
        # a multi-chip backend reports post-partitioning per-device HLO
        # instead, drop the /n_dev below before trusting MFU there.
        #
        # XLA cost analysis counts a while/scan BODY ONCE, not times its
        # trip count — this program scans STEPS_PER_CALL train steps, so
        # flops/bytes must be scaled by it. (Verified against the scan-
        # free per-step program in benchmarks/models.py: one step is
        # ~3.6e11 flops at B=32; the unscaled scan program reported
        # exactly that for 25 steps, which is how rounds 1-2 published a
        # 25x-undercounted 0.74% MFU / 29 GB/s. True: ~19% MFU at
        # ~600-740 GB/s — bandwidth-saturated, BENCH_SWEEP_r03.json.)
        per_call_s = dt / MEASURE_CALLS
        scale = STEPS_PER_CALL
        tflops = cost["flops"] * scale / per_call_s / 1e12 / n_dev
        record["achieved_tflops_per_chip"] = round(tflops, 3)
        record["mfu"] = round(tflops / MXU_BF16_TFLOPS, 4)
        record["hbm_gbps"] = round(
            cost["bytes_accessed"] * scale / per_call_s / 1e9 / n_dev, 1)
    watchdog.close()
    print(json.dumps(record))


if __name__ == "__main__":
    main()
