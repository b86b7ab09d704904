"""Batch-size sweep: find the configuration that saturates the chip.

The headline bench pins the reference's B=32 for cross-round
comparability, but at 1024-point clouds that leaves the chip
latency-bound (docs/PERF.md: ~0.7% MFU, many small kernels). Batch size
is the free lever — the identical program at larger B amortizes fixed
kernel latencies. This sweep measures the full fwd+bwd step for the
flagship classifier and the sem_seg model across batch sizes and records
clouds/s, MFU, and HBM GB/s per point, so "the framework can saturate a
chip" is a measured claim with a named peak configuration, not an
extrapolation.

Run (real chip): python benchmarks/sweep_batch.py [--out BENCH_SWEEP.json]
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "benchmarks")

from models import bench_model  # noqa: E402  (benchmarks/models.py)

SWEEPS = [
    # (model, npoint, in_channels, model_kwargs, batch sizes)
    ("pointnet2_cls_ssg", 1024, 3, None,
     (32, 64, 128, 256, 512, 1024)),
    ("pointnet2_sem_seg", 8192, 3, None, (8, 16, 32, 64)),
]


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    results = []
    for name, N, C, mkw, batches in SWEEPS:
        for B in batches:
            try:
                row = bench_model(name, B, N, C, mkw)
            except Exception as e:  # OOM at the top of a sweep is data
                results.append({"model": name, "batch": B, "npoint": N,
                                "error": f"{type(e).__name__}: {e}"[:200]})
                print(json.dumps(results[-1]), flush=True)
                break
            row["model"] = name
            results.append(row)
            print(json.dumps(row), flush=True)
    # name the peak configuration PER MODEL: raw clouds/s is not
    # comparable across cloud sizes (a 1024-pt cls cloud is ~8x cheaper
    # than an 8192-pt sem_seg cloud), so a single global max would always
    # crown the smallest model
    ok = [r for r in results if "error" not in r]
    summary = {"rows": results, "peak": {}}
    for name in {r["model"] for r in ok}:
        peak = max((r for r in ok if r["model"] == name),
                   key=lambda r: r["train_clouds_per_sec"])
        summary["peak"][name] = {
            k: peak[k] for k in ("batch", "npoint", "train_clouds_per_sec",
                                 "train_mfu", "train_tflops",
                                 "train_hbm_gbps") if k in peak}
    print(json.dumps(summary["peak"]))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
