"""Per-model training throughput at the reference configurations.

Times forward (eval) and forward+backward (train, grads wrt params) for
every model family in the registry, in the bf16 deployment configuration,
and prints clouds/sec for each. Complements bench.py (which tracks only the
flagship classifier) — the reference trains all five families
(SURVEY.md §2.2 models row; configs: train.py:27-31, README.md:59,
part_seg/train.py, scannet/train.py).

Run: python benchmarks/models.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from pointnet2_tpu.models import MODEL_REGISTRY
from pointnet2_tpu.utils.profiling import compiled_cost, time_op_loop

from pointnet2_tpu.utils.profiling import MXU_BF16_TFLOPS

# (model, batch, npoint, in_channels) at the reference's training configs
CONFIGS = [
    ("pointnet_cls_basic", 32, 1024, 3, None),
    ("pointnet2_cls_ssg", 32, 1024, 3, None),
    ("pointnet2_cls_msg", 16, 1024, 3, None),
    # the paper's headline recipe (README.md:59): 5000 pts, XYZ+normal,
    # nsample=128 in SA1/SA2
    ("pointnet2_cls_msg", 8, 5000, 6,
     {"sa1_nsample": (128, 128, 128), "sa2_nsample": (128, 128, 128)}),
    ("pointnet2_part_seg", 16, 2048, 6, None),
    ("pointnet2_part_seg_msg_one_hot", 16, 2048, 6, None),
    ("pointnet2_sem_seg", 16, 8192, 3, None),
]


def bench_model(name: str, B: int, N: int, C: int,
                model_kwargs: dict | None = None) -> dict:
    spec = MODEL_REGISTRY[name]
    model = spec.cls(dtype=jnp.bfloat16, **(model_kwargs or {}))
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.rand(B, N, C).astype(np.float32))
    task = spec.task

    extra = ()
    if task == "part_seg_one_hot":
        extra = (jnp.asarray(rng.randint(0, 16, (B,)).astype(np.int32)),)
    if task == "cls":
        label = jnp.asarray(rng.randint(0, 40, (B,)).astype(np.int32))
        def loss_fn(logits):
            return spec.loss(logits, label)
    elif task in ("part_seg", "part_seg_one_hot"):
        label = jnp.asarray(rng.randint(0, 50, (B, N)).astype(np.int32))
        def loss_fn(logits):
            return spec.loss(logits, label)
    else:  # sem_seg: weighted CE
        label = jnp.asarray(rng.randint(0, 21, (B, N)).astype(np.int32))
        smpw = jnp.ones((B, N), jnp.float32)
        def loss_fn(logits):
            return spec.loss(logits, label, smpw)

    variables = jax.jit(lambda r, p: model.init(r, p, *extra, train=False))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        pts)

    def fwd(x):
        logits, _ = model.apply(variables, x, *extra, train=False)
        return logits

    fwd_s = time_op_loop(fwd, pts, iters=30)

    def train_loss(params, x):
        (logits, _), _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, *extra, train=True, bn_momentum=0.9,
            rngs={"dropout": jax.random.PRNGKey(2)},
            mutable=["batch_stats"])
        return loss_fn(logits)

    def vag(x):
        return jax.value_and_grad(train_loss)(variables["params"], x)

    step_s = time_op_loop(vag, pts, iters=30)
    # sub-10us measurements are below the loop-overhead subtraction's noise
    # floor (pointnet_cls_basic eval is ~50us) — clamp so throughput stays
    # meaningful instead of dividing by ~0
    fwd_s = max(fwd_s, 1e-5)
    step_s = max(step_s, 1e-5)
    row = {
        "batch": B, "npoint": N,
        "fwd_ms": round(fwd_s * 1e3, 3),
        "fwd_bwd_ms": round(step_s * 1e3, 3),
        "train_clouds_per_sec": round(B / step_s, 1),
        "eval_clouds_per_sec": round(B / fwd_s, 1),
    }
    # Roofline placement (VERDICT r1 item 7): XLA's own flop/byte counts
    # for the fwd+bwd program over measured device time -> achieved TFLOPs,
    # MFU vs the MXU bf16 peak, and apparent HBM bandwidth. Shows *why*
    # each model sits where it does: small-N clouds are memory/latency
    # bound (low MFU, high GB/s), not MXU bound.
    cost = compiled_cost(jax.jit(vag), pts)
    if cost is not None:
        tflops = cost["flops"] / step_s / 1e12
        row["train_mfu"] = round(tflops / MXU_BF16_TFLOPS, 4)
        row["train_tflops"] = round(tflops, 3)
        row["train_hbm_gbps"] = round(
            cost["bytes_accessed"] / step_s / 1e9, 1)
    return row


def main() -> None:
    out = {}
    for name, B, N, C, mkw in CONFIGS:
        key = name if mkw is None else f"{name}_n{N}"
        out[key] = bench_model(name, B, N, C, mkw)
        print(key, json.dumps(out[key]), flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
