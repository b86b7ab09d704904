"""Serving benchmark: Predictor latency/throughput on the real chip.

Measures the deployment surface end-to-end as a client sees it — host
wall-clock around each call, including padding, host->device transfer, and
logit fetch (unlike the on-device loops elsewhere in benchmarks/):

- per-bucket latency (p50/p95 over repeated calls) for the classifier;
- large-request throughput streaming through the largest bucket;
- 12-vote ensemble latency (the evaluate.py protocol as a serving call);
- whole-scene segmentation (predict_scene) on a procedural room.

Run: python benchmarks/serving.py [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import numpy as np

from pointnet2_tpu.serving import Predictor

N_CLS = 1024


def _fresh_predictor(model: str, num_point: int, in_channels: int = 3,
                     **kw) -> Predictor:
    import jax.numpy as jnp

    from pointnet2_tpu.models import MODEL_REGISTRY

    spec = MODEL_REGISTRY[model]
    m = spec.cls(dtype=jnp.bfloat16)
    pts = jnp.zeros((1, num_point, in_channels), jnp.float32)
    variables = jax.jit(lambda r, p: m.init(r, p, train=False))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        pts)
    return Predictor(model, variables, **kw)


def _timed_calls(fn, calls: int = 30, warmup: int = 3):
    for _ in range(warmup):
        np.asarray(fn()).ravel()[0]
    ts = []
    for _ in range(calls):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(out).ravel()[0]  # client-visible fence
        ts.append(time.perf_counter() - t0)
    ts = np.sort(ts)
    # interpolated percentile; with few calls the old nearest-index pick
    # (ts[int(.95*n)]) degenerated to the sample MAX and published a
    # single transport hiccup as the tail latency
    return {"p50_ms": round(float(np.median(ts)) * 1e3, 2),
            "p95_ms": round(float(np.percentile(ts, 95)) * 1e3, 2),
            "max_ms": round(float(ts[-1]) * 1e3, 2),
            "calls": len(ts)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    rng = np.random.RandomState(0)
    res = {"backend": jax.default_backend()}

    cls = _fresh_predictor("pointnet2_cls_ssg", N_CLS)
    for b in (1, 4, 16, 64):
        pts = rng.rand(b, N_CLS, 3).astype(np.float32)
        row = _timed_calls(lambda: cls(pts))
        row["clouds_per_sec"] = round(b / (row["p50_ms"] / 1e3), 1)
        res[f"cls_b{b}"] = row
        print(f"cls_b{b}", json.dumps(row), flush=True)

    # large request streamed through the biggest bucket
    big = rng.rand(512, N_CLS, 3).astype(np.float32)
    row = _timed_calls(lambda: cls(big), calls=20)
    row["clouds_per_sec"] = round(512 / (row["p50_ms"] / 1e3), 1)
    res["cls_b512_stream"] = row
    print("cls_b512_stream", json.dumps(row), flush=True)

    votes_in = rng.rand(16, N_CLS, 3).astype(np.float32)
    # default: ONE dispatch — batch uploaded once, the 12 views built on
    # device from (V, N) permutations, logits summed before the fetch
    row = _timed_calls(lambda: cls.predict_votes(votes_in, 12), calls=20)
    row["clouds_per_sec"] = round(16 / (row["p50_ms"] / 1e3), 1)
    res["cls_b16_vote12"] = row
    print("cls_b16_vote12", json.dumps(row), flush=True)

    # host-stacked views through the default buckets: 192 uploaded rows,
    # 3 dispatches of the 64-bucket (the mesh / multihost fallback path)
    row = _timed_calls(
        lambda: cls.predict_votes(votes_in, 12, on_device=False), calls=20)
    row["clouds_per_sec"] = round(16 / (row["p50_ms"] / 1e3), 1)
    res["cls_b16_vote12_hoststack"] = row
    print("cls_b16_vote12_hoststack", json.dumps(row), flush=True)

    # host-stacked with a bucket sized to V*B: one dispatch, 12x upload
    cls_wide = _fresh_predictor("pointnet2_cls_ssg", N_CLS,
                                buckets=(16, 192))
    row = _timed_calls(
        lambda: cls_wide.predict_votes(votes_in, 12, on_device=False),
        calls=20)
    row["clouds_per_sec"] = round(16 / (row["p50_ms"] / 1e3), 1)
    res["cls_b16_vote12_wide"] = row
    print("cls_b16_vote12_wide", json.dumps(row), flush=True)

    # the r4 protocol for comparison: one dispatch PER VOTE (the
    # reference's sess.run loop, evaluate.py:126-141) — documents the
    # dispatch-floor penalty the batched path removes
    from pointnet2_tpu.data import augment as A

    def sequential_votes():
        g = np.random.default_rng(0)
        total = None
        for v in range(12):
            perm = g.permutation(N_CLS)
            rot = A.rotate_point_cloud_by_angle(votes_in[:, perm, :],
                                                v / 12.0 * 2 * np.pi)
            lg = np.asarray(cls(rot), np.float64)
            total = lg if total is None else total + lg
        return total

    row = _timed_calls(sequential_votes, calls=10)
    row["clouds_per_sec"] = round(16 / (row["p50_ms"] / 1e3), 1)
    res["cls_b16_vote12_sequential"] = row
    print("cls_b16_vote12_sequential", json.dumps(row), flush=True)

    # whole-scene segmentation serving
    from pointnet2_tpu.data.procedural_scannet import generate_scenes

    seg = _fresh_predictor("pointnet2_sem_seg", 8192, buckets=(1, 4))
    scene_pts, _ = generate_scenes(1, seed=0)[0]
    scene_pts = scene_pts.astype(np.float32)
    row = _timed_calls(lambda: seg.predict_scene(scene_pts)["labels"],
                       calls=16, warmup=2)
    row["scene_points"] = int(len(scene_pts))
    row["points_per_sec"] = round(len(scene_pts) / (row["p50_ms"] / 1e3))
    res["semseg_scene"] = row
    print("semseg_scene", json.dumps(row), flush=True)

    print(json.dumps(res, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
