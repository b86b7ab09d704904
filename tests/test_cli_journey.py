"""End-to-end user-journey smoke test through the argparse CLIs.

Exercises the same path a reference user follows (train.py -> evaluate.py
-> visualization scripts), hermetically on synthetic data:
cli.train writes checkpoints and metrics, cli.evaluate restores them and
runs the vote protocol, cli.visualize renders predictions, and the serving
Predictor restores the same checkpoint.
"""

import json
import os

import numpy as np

from pointnet2_tpu.cli import evaluate as cli_evaluate
from pointnet2_tpu.cli import train as cli_train
from pointnet2_tpu.cli import visualize as cli_visualize


def test_cli_train_evaluate_visualize_serve(tmp_path):
    log_dir = str(tmp_path / "log")
    np_pts = 64  # matches test_train/test_overfit shapes -> shared jit cache

    cli_train.main([
        "--model", "pointnet2_cls_ssg", "--synthetic",
        "--synthetic_size", "2", "--num_point", str(np_pts),
        "--batch_size", "8", "--max_epoch", "1", "--eval_every", "1",
        "--log_dir", log_dir,
    ])
    assert os.path.isdir(os.path.join(log_dir, "ckpt"))
    metrics = [json.loads(line)
               for line in open(os.path.join(log_dir, "metrics.jsonl"))]
    assert any(m.get("split") == "eval" for m in metrics)

    cli_evaluate.main([
        "--model", "pointnet2_cls_ssg", "--synthetic",
        "--synthetic_size", "2", "--num_point", str(np_pts),
        "--batch_size", "8", "--num_votes", "2", "--log_dir", log_dir,
    ])

    out_dir = str(tmp_path / "viz")
    cli_visualize.main([
        "--model", "pointnet2_cls_ssg", "--synthetic",
        "--synthetic_size", "2", "--num_point", str(np_pts),
        "--batch_size", "8", "--num_samples", "2",
        "--log_dir", log_dir, "--out", out_dir,
    ])
    assert os.listdir(out_dir)

    from pointnet2_tpu.serving import Predictor

    pred = Predictor.from_checkpoint(
        "pointnet2_cls_ssg", log_dir, num_point=np_pts, buckets=(4,),
        dtype=None)
    logits = pred(np.random.RandomState(0).rand(3, np_pts, 3)
                  .astype(np.float32))
    assert logits.shape == (3, 40) and np.isfinite(logits).all()
