"""Speed-of-light ledger: does the measured step equal the sum of floors?

"Bandwidth-saturated" (cls_ssg) and "compute-bound in the neighbor
machinery" (sem_seg) were asserted from aggregate roofline numbers for
four rounds; this harness itemizes them. For every pipeline stage of the
two headline steps (cls_ssg B=32/1024, sem_seg B=16/8192, bf16):

- measured fwd+bwd ms (on-device loop, utils/profiling.time_op_loop);
- XLA's own flops / bytes for the stage (compiled_cost of the optimized
  HLO) -> per-stage floors: bytes/820 GB/s (measured XLA-achievable HBM
  ceiling, docs/PERF.md) and flops/197 TF/s (MXU bf16 peak);
- for SA stages, the analytic VPU floor of the ball-query slot
  extraction (~(8 + 2*nsample) ops per (query, dataset-point) pair over
  the ~3.8 Tops/s VPU), which XLA's flop count does not model (the
  Pallas kernel is a custom call);
- headroom = measured - max(floors): the part of the stage not pinned
  to a hardware resource.

Two checks close the ledger: sum(stage measured) vs the measured
end-to-end step (completeness of the decomposition — the step includes
optimizer/augment, measured as its own row), and sum(stage floors) vs
the step (the speed-of-light claim itself).

Run (chip): python benchmarks/ledger.py [--model cls_ssg|sem_seg|both]
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
from pointnet2_tpu.nn.pointnet import FeaturePropagation, SetAbstraction
from pointnet2_tpu.train.schedules import (
    bn_momentum_schedule,
    exponential_decay_clipped,
)
from pointnet2_tpu.train.state import TrainState, make_optimizer
from pointnet2_tpu.train.steps import make_train_step
from pointnet2_tpu.utils.profiling import (
    MXU_BF16_TFLOPS,
    compiled_cost,
    time_op_loop,
)

HBM_GBPS = 819.0
VPU_TOPS = 3.8
DT = jnp.bfloat16


def _floors(row, cost, vpu_ops=0.0):
    if cost is not None:
        row["xla_gflops"] = round(cost["flops"] / 1e9, 2)
        row["xla_mbytes"] = round(cost["bytes_accessed"] / 1e6, 2)
        row["floor_mxu_ms"] = round(
            cost["flops"] / (MXU_BF16_TFLOPS * 1e12) * 1e3, 3)
        row["floor_hbm_ms"] = round(
            cost["bytes_accessed"] / (HBM_GBPS * 1e9) * 1e3, 3)
    if vpu_ops:
        row["floor_vpu_ms"] = round(vpu_ops / (VPU_TOPS * 1e12) * 1e3, 3)
    row["floor_ms"] = round(max(row.get("floor_mxu_ms", 0.0),
                                row.get("floor_hbm_ms", 0.0),
                                row.get("floor_vpu_ms", 0.0)), 3)
    row["headroom_ms"] = round(row["fwd_bwd_ms"] - row["floor_ms"], 3)
    return row


def bq_vpu_ops(B, M, N, nsample):
    """Slot extraction is ~2 VPU ops (compare + reduce-add lane) per
    (slot, query, dataset-lane) plus ~8 ops building the distance tile."""
    return B * M * N * (8.0 + 2.0 * nsample)


def bench_sa(name, B, npoint, radius, nsample, mlp, N, C, rng, res,
             group_all=False):
    sa = (SetAbstraction(None, None, None, mlp, group_all=True, dtype=DT)
          if group_all else
          SetAbstraction(npoint, radius, nsample, mlp, dtype=DT))
    xyz = jnp.asarray(rng.rand(B, N, 3).astype(np.float32))
    pts = (jnp.asarray(rng.rand(B, N, C).astype(np.float32)) if C else None)
    v = jax.jit(lambda x: sa.init(jax.random.PRNGKey(0), x, pts,
                                  train=False))(xyz)

    def bwd(x):
        def loss(params, x):
            (_, out, _), _ = sa.apply(
                {"params": params, "batch_stats": v["batch_stats"]}, x, pts,
                train=True, mutable=["batch_stats"])
            return jnp.sum(jnp.square(out.astype(jnp.float32)))
        return jax.grad(loss, argnums=(0, 1))(v["params"], x)

    row = {"fwd_bwd_ms": round(
        max(time_op_loop(bwd, xyz, iters=30), 1e-5) * 1e3, 3)}
    vpu = 0.0 if group_all else bq_vpu_ops(B, npoint, N, nsample)
    res[name] = _floors(row, compiled_cost(jax.jit(bwd), xyz), vpu)
    print(name, json.dumps(res[name]), flush=True)


def bench_fp(name, B, mlp, N, M, C1, C2, rng, res):
    fp = FeaturePropagation(mlp, dtype=DT)
    xyz1 = jnp.asarray(rng.rand(B, N, 3).astype(np.float32))
    xyz2 = jnp.asarray(rng.rand(B, M, 3).astype(np.float32))
    p1 = (jnp.asarray(rng.rand(B, N, C1).astype(np.float32)) if C1 else None)
    p2 = jnp.asarray(rng.rand(B, M, C2).astype(np.float32))
    v = jax.jit(lambda a, b, c: fp.init(jax.random.PRNGKey(0), a, b, p1, c,
                                        train=False))(xyz1, xyz2, p2)

    def bwd(p2_):
        def loss(params, p2_):
            out, _ = fp.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                xyz1, xyz2, p1, p2_, train=True, mutable=["batch_stats"])
            return jnp.sum(jnp.square(out.astype(jnp.float32)))
        return jax.grad(loss, argnums=(0, 1))(v["params"], p2_)

    row = {"fwd_bwd_ms": round(
        max(time_op_loop(bwd, p2, iters=30), 1e-5) * 1e3, 3)}
    res[name] = _floors(row, compiled_cost(jax.jit(bwd), p2))
    print(name, json.dumps(res[name]), flush=True)


def bench_head(name, widths, in_shape, rng, res):
    """The model's prediction head as its own ledger stage: a DenseBN
    chain with dropout between layers and a BN-free linear final layer
    (cls_ssg.py fc1-fc3 on the (B, 1024) pooled vector; sem_seg.py
    fc1-fc2 on all (B, N, 128) points), fwd+bwd with dropout active as
    in training."""
    import flax.linen as nn

    from pointnet2_tpu.nn.layers import DenseBN

    class Head(nn.Module):
        @nn.compact
        def __call__(self, x, train):
            for i, w in enumerate(widths[:-1]):
                x = DenseBN(w, dtype=DT, name=f"fc{i + 1}")(x, train, 0.9)
                x = nn.Dropout(0.5, deterministic=not train)(x)
            x = DenseBN(widths[-1], bn=False, activation=None,
                        name=f"fc{len(widths)}")(x, train, 0.9)
            return x.astype(jnp.float32)

    head = Head()
    feats = jnp.asarray(rng.rand(*in_shape).astype(np.float32))
    v = jax.jit(lambda x: head.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, False))(feats)

    def bwd(x):
        def loss(params, x):
            out, _ = head.apply(
                {"params": params, "batch_stats": v["batch_stats"]}, x,
                True, rngs={"dropout": jax.random.PRNGKey(2)},
                mutable=["batch_stats"])
            return jnp.sum(jnp.square(out))
        return jax.grad(loss, argnums=(0, 1))(v["params"], x)

    row = {"fwd_bwd_ms": round(
        max(time_op_loop(bwd, feats, iters=30), 1e-5) * 1e3, 3)}
    res[name] = _floors(row, compiled_cost(jax.jit(bwd), feats))
    print(name, json.dumps(res[name]), flush=True)


def bench_step_and_model(model_name, B, N, C, task, num_classes, rng, res):
    """End-to-end rows: the full train step (with optimizer+augment) and
    the bare fwd+bwd (value_and_grad), so 'optimizer/augment/loss' is the
    measured difference of two programs, not a guess."""
    spec = MODEL_REGISTRY[model_name]
    model = spec.cls(dtype=DT)
    pts = jnp.asarray(rng.rand(B, N, C).astype(np.float32))
    variables = jax.jit(lambda r, p: model.init(r, p, train=False))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        pts)
    if task == "cls":
        label = jnp.asarray(rng.randint(0, num_classes, (B,)).astype(np.int32))
        batch = {"points": pts, "label": label}
        aug = "cls"
        def loss_fn(logits):
            return spec.loss(logits, label)
    else:
        label = jnp.asarray(
            rng.randint(0, num_classes, (B, N)).astype(np.int32))
        smpw = jnp.ones((B, N), jnp.float32)
        batch = {"points": pts, "seg": label, "smpw": smpw}
        aug = "scannet"
        def loss_fn(logits):
            return spec.loss(logits, label, smpw)

    def vag(x):
        def train_loss(params, x):
            (logits, _), _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, bn_momentum=0.9,
                rngs={"dropout": jax.random.PRNGKey(2)},
                mutable=["batch_stats"])
            return loss_fn(logits)
        return jax.value_and_grad(train_loss)(variables["params"], x)

    row = {"fwd_bwd_ms": round(time_op_loop(vag, pts, iters=30) * 1e3, 3)}
    res["model_fwd_bwd"] = _floors(row, compiled_cost(jax.jit(vag), pts))
    print("model_fwd_bwd", json.dumps(res["model_fwd_bwd"]), flush=True)

    tx = make_optimizer("adam", exponential_decay_clipped(1e-3, B, 200000,
                                                          0.7))
    bn_fn = bn_momentum_schedule(B, 200000)
    state0 = TrainState(step=jnp.zeros((), jnp.int32),
                        params=variables["params"],
                        batch_stats=variables["batch_stats"],
                        opt_state=tx.init(variables["params"]))
    step = make_train_step(model, spec.loss, tx, bn_fn, task=task,
                           augment=aug)

    def op(p):
        st = jax.tree_util.tree_map(jnp.copy, state0)
        st2, m = step(st, dict(batch, points=p), jax.random.PRNGKey(7))
        return m["loss"], st2.params, st2.opt_state

    row = {"fwd_bwd_ms": round(time_op_loop(op, pts, iters=20) * 1e3, 3)}
    res["train_step"] = _floors(row, compiled_cost(jax.jit(op), pts))
    print("train_step", json.dumps(res["train_step"]), flush=True)


def summarize(res, stage_keys):
    stages = {k: res[k] for k in stage_keys if k in res}
    sum_measured = sum(r["fwd_bwd_ms"] for r in stages.values())
    sum_floor = sum(r["floor_ms"] for r in stages.values())
    step = res["train_step"]["fwd_bwd_ms"]
    model_ms = res["model_fwd_bwd"]["fwd_bwd_ms"]
    extras = round(step - model_ms, 3)  # optimizer + augment + loss + stats
    out = {
        "sum_stage_measured_ms": round(sum_measured, 3),
        "model_fwd_bwd_ms": model_ms,
        "decomposition_gap_ms": round(model_ms - sum_measured, 3),
        "optimizer_augment_extras_ms": extras,
        "sum_stage_floors_ms": round(sum_floor, 3),
        "train_step_ms": step,
        "sum_floors_plus_extras_ms": round(sum_floor + max(extras, 0.0), 3),
        "step_over_floors": round(step / max(sum_floor + max(extras, 0.0),
                                             1e-9), 3),
    }
    return out


def run_cls(res_all):
    rng = np.random.RandomState(0)
    res = {}
    B = 32
    # models/pointnet2_cls_ssg.py:32-42 (reference shapes)
    bench_sa("sa1", B, 512, 0.2, 32, (64, 64, 128), 1024, 0, rng, res)
    bench_sa("sa2", B, 128, 0.4, 64, (128, 128, 256), 512, 128, rng, res)
    bench_sa("sa3_group_all", B, None, None, None, (256, 512, 1024), 128,
             256, rng, res, group_all=True)
    bench_head("head", (512, 256, 40), (B, 1024), rng, res)
    bench_step_and_model("pointnet2_cls_ssg", B, 1024, 3, "cls", 40, rng,
                         res)
    res["summary"] = summarize(res, ["sa1", "sa2", "sa3_group_all", "head"])
    print("summary", json.dumps(res["summary"]), flush=True)
    res_all["cls_ssg_b32"] = res


def run_semseg(res_all):
    rng = np.random.RandomState(0)
    res = {}
    B = 16
    # models/pointnet2_sem_seg.py:28-44 (reference shapes)
    bench_sa("sa1", B, 1024, 0.1, 32, (32, 32, 64), 8192, 0, rng, res)
    bench_sa("sa2", B, 256, 0.2, 32, (64, 64, 128), 1024, 64, rng, res)
    bench_sa("sa3", B, 64, 0.4, 32, (128, 128, 256), 256, 128, rng, res)
    bench_sa("sa4", B, 16, 0.8, 32, (256, 256, 512), 64, 256, rng, res)
    bench_fp("fp1", B, (256, 256), 64, 16, 256, 512, rng, res)
    bench_fp("fp2", B, (256, 256), 256, 64, 128, 256, rng, res)
    bench_fp("fp3", B, (256, 128), 1024, 256, 64, 256, rng, res)
    bench_fp("fp4", B, (128, 128, 128), 8192, 1024, 0, 128, rng, res)
    bench_head("head", (128, 21), (B, 8192, 128), rng, res)
    bench_step_and_model("pointnet2_sem_seg", B, 8192, 3, "sem_seg", 21,
                         rng, res)
    res["summary"] = summarize(
        res, ["sa1", "sa2", "sa3", "sa4", "fp1", "fp2", "fp3", "fp4",
              "head"])
    print("summary", json.dumps(res["summary"]), flush=True)
    res_all["sem_seg_b16"] = res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="both",
                    choices=["cls_ssg", "sem_seg", "both"])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    res = {"backend": jax.default_backend()}
    if args.model in ("cls_ssg", "both"):
        run_cls(res)
    if args.model in ("sem_seg", "both"):
        run_semseg(res)
    print(json.dumps(res, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
