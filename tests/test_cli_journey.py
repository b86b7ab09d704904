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


def test_model_kwargs_flag_parses_and_builds(tmp_path):
    """--model_kwargs JSON reaches the model constructor (lists become
    tuples for flax field hashability); enables the MSG 5000-pt
    nsample=128 paper recipe (README.md:59) from the CLI."""
    cli_train.main([
        "--model", "pointnet2_cls_msg", "--synthetic",
        "--synthetic_size", "1", "--num_point", "96", "--batch_size", "8",
        "--max_epoch", "1", "--log_dir", str(tmp_path / "kw"),
        "--model_kwargs",
        '{"sa1_nsample": [8, 8, 8], "sa2_nsample": [8, 8, 8]}'])
    cfg = json.loads((tmp_path / "kw" / "config.json").read_text())
    assert cfg["model_kwargs"]["sa1_nsample"] == [8, 8, 8]


def test_parallel_map_order_and_laziness():
    from pointnet2_tpu.utils.prefetch import parallel_map

    out = list(parallel_map(lambda x: x * x, range(23), workers=3))
    assert out == [x * x for x in range(23)]
    # bounded window: taking a prefix must not consume the whole stream
    consumed = []

    def src():
        for i in range(1000):
            consumed.append(i)
            yield i

    it = parallel_map(lambda x: x, src(), workers=2, ahead=4)
    head = [next(it) for _ in range(3)]
    assert head == [0, 1, 2]
    assert len(consumed) < 50


def test_plot_metrics_cli(tmp_path):
    """Learning-curve PNGs from a run dir (the TensorBoard-scalar gap,
    reference train.py:118,125-131)."""
    import json

    run = tmp_path / "run"
    run.mkdir()
    rows = [
        {"epoch": 0, "split": "train", "loss": 2.0, "accuracy": 0.1,
         "learning_rate": 1e-3, "step": 10},
        {"epoch": 0, "split": "eval", "accuracy": 0.2},
        {"epoch": 1, "split": "train", "loss": 1.0, "accuracy": 0.5,
         "learning_rate": 9e-4, "step": 20},
        {"epoch": 1, "split": "eval", "accuracy": 0.4},
    ]
    with open(run / "metrics.jsonl", "w") as fp:
        for r in rows:
            fp.write(json.dumps(r) + "\n")
        fp.write('{"torn line\n')  # killed-run tail must not crash the tool

    from pointnet2_tpu.cli import plot_metrics

    out = tmp_path / "curves.png"
    plot_metrics.main([str(run), "--out", str(out)])
    assert out.is_file() and out.stat().st_size > 1000

    series = plot_metrics.load_metrics(str(run))
    assert series[("train", "loss")] == [(0.0, 2.0), (1.0, 1.0)]
    assert series[("eval", "accuracy")] == [(0.0, 0.2), (1.0, 0.4)]
