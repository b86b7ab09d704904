"""Visualization CLI: render clouds and model predictions to images.

Headless counterpart of the reference's interactive viewers
(part_seg/test.py:71-85, utils/show3d_balls.py): renders point clouds with
the native C++ ball rasterizer, coloring by predicted part/class labels
when a checkpoint is given, and writes PNGs (plus the canonical three-view
gray image from pc_util).

Usage:
  # synthetic part-seg predictions from a checkpoint
  python -m pointnet2_tpu.cli.visualize --model pointnet2_part_seg_msg_one_hot \
      --synthetic --log_dir log --out viz_out
  # just render a cloud file (ply or txt) without a model
  python -m pointnet2_tpu.cli.visualize --cloud path/to/cloud.ply --out viz_out
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from pointnet2_tpu.models import MODEL_REGISTRY

_PALETTE = None


def _palette(n: int) -> np.ndarray:
    global _PALETTE
    if _PALETTE is None or len(_PALETTE) < n:
        rng = np.random.default_rng(7)
        _PALETTE = (rng.random((max(n, 64), 3)) * 205 + 50).astype(np.uint8)
    return _PALETTE


def _save_png(image: np.ndarray, path: str) -> None:
    from PIL import Image

    if image.ndim == 2:
        image = (np.clip(image, 0, 1) * 255).astype(np.uint8)
    Image.fromarray(image).save(path)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default=None, choices=sorted(MODEL_REGISTRY))
    p.add_argument("--cloud", default=None, help="ply/txt cloud to render")
    p.add_argument("--data", default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic_size", type=int, default=2)
    p.add_argument("--normal", action="store_true")
    p.add_argument("--log_dir", default="log")
    p.add_argument("--ckpt", default="ckpt")
    p.add_argument("--num_point", type=int, default=1024)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--num_samples", type=int, default=4)
    p.add_argument("--out", default="viz_out")
    p.add_argument("--canvas", type=int, default=800)
    p.add_argument("--ballradius", type=int, default=6)
    p.add_argument("--num_classes", type=int, default=None)
    p.add_argument("--model_kwargs", type=str, default=None,
                   help="JSON dict of model overrides; must match the "
                        "trained config for checkpoint restore")
    return p


def main(argv=None) -> None:
    from pointnet2_tpu.utils import pc_util
    from pointnet2_tpu.viz import render

    args = build_parser().parse_args(argv)
    os.makedirs(args.out, exist_ok=True)

    if args.cloud is not None:
        if args.cloud.endswith(".ply"):
            pts = pc_util.read_ply(args.cloud)
        else:
            try:  # comma-separated (modelnet40_normal_resampled layout)...
                pts = np.loadtxt(args.cloud, delimiter=",")[:, :3]
            except ValueError:  # ...or whitespace (ShapeNet-part txt)
                pts = np.loadtxt(args.cloud)[:, :3]
        _save_png(render(pts, canvas=args.canvas,
                         ballradius=args.ballradius),
                  os.path.join(args.out, "cloud.png"))
        _save_png(pc_util.point_cloud_three_views(pts[:, :3]),
                  os.path.join(args.out, "cloud_three_views.png"))
        print(f"wrote {args.out}/cloud.png")
        return

    if args.model is None:
        raise SystemExit("need --model (with optional checkpoint) or --cloud")

    from pointnet2_tpu.cli.train import make_datasets, parse_model_kwargs
    from pointnet2_tpu.parallel.mesh import shard_batch
    from pointnet2_tpu.train import TrainConfig, Trainer
    from pointnet2_tpu.train import checkpoint as ckpt

    task = MODEL_REGISTRY[args.model].task
    _, test_ds, _ = make_datasets(args, test_only=True)
    trainer = Trainer(TrainConfig(model=args.model,
                                  batch_size=args.batch_size,
                                  log_dir=args.log_dir,
                                  model_kwargs=parse_model_kwargs(args,
                                                                  task)))
    example = next(iter(test_ds.epoch()))
    state = trainer.init_state(trainer._device_view(example))
    have_ckpt = ckpt.latest_step(args.log_dir, args.ckpt) is not None
    if have_ckpt:
        state = ckpt.restore_checkpoint(args.log_dir, state, name=args.ckpt)
        trainer.log(f"restored {args.ckpt} at step {int(state.step)}")
    else:
        trainer.log("no checkpoint found; rendering untrained predictions")

    batch = next(iter(test_ds.epoch()))
    db = shard_batch(trainer.mesh, trainer._device_view(batch))
    logits = np.asarray(trainer.eval_step(state, db))
    n = min(args.num_samples, batch["nvalid"])
    for i in range(n):
        pts = batch["points"][i, :, :3]
        if task == "cls":
            pred = int(logits[i].argmax())
            colors = None
            name = f"sample{i}_pred{pred}.png"
        else:
            pred = logits[i].argmax(-1)
            colors = _palette(int(pred.max()) + 1)[pred]
            name = f"sample{i}_seg.png"
            truth = batch["seg"][i]
            _save_png(render(pts, _palette(int(truth.max()) + 1)[truth],
                             canvas=args.canvas, ballradius=args.ballradius),
                      os.path.join(args.out, f"sample{i}_gt.png"))
        _save_png(render(pts, colors, canvas=args.canvas,
                         ballradius=args.ballradius),
                  os.path.join(args.out, name))
        print(f"wrote {args.out}/{name}")


if __name__ == "__main__":
    main()
