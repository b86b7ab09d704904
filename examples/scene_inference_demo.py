"""Whole-scene semantic segmentation as a serving call.

The reference can only segment scenes inside its eval loop
(scannet/train.py:326-427, eval-only stitching); here a trained
checkpoint becomes an endpoint and `predict_scene` labels an
arbitrary-size scene through the compiled fixed-shape path — standard
1.5 m tiling with 0.2 m overlap, full point coverage (every member of
every block is scored), and summed-logit ensembling in the overlap bands.

Run:
  python examples/scene_inference_demo.py \
      --ckpt runs/procscannet_semseg_bf16 [--out scene_pred.png]
Without --ckpt (checkpoints are run artifacts, not committed) the demo
drives the identical pipeline with randomly initialized weights and says
so — train one first with the docs/ACCURACY.md ScanNet recipe for real
labels.

Measured on the r3 run's best checkpoint with a held-out generated room
(seed 999, 78k points): annotated-point accuracy 0.68, every point
scored by 1-4 block votes.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", default=None,
                    help="run dir with an orbax checkpoint (e.g. "
                         "runs/procscannet_semseg_bf16); omitted = "
                         "random weights, pipeline demo only")
    ap.add_argument("--ckpt_name", default="best")
    ap.add_argument("--seed", type=int, default=999)
    ap.add_argument("--out", default=None,
                    help="optional PNG of ground truth vs prediction")
    args = ap.parse_args()

    from pointnet2_tpu.data.procedural_scannet import make_scene
    from pointnet2_tpu.serving import Predictor

    if args.ckpt:
        pred = Predictor.from_checkpoint(
            "pointnet2_sem_seg", args.ckpt, num_point=8192,
            name=args.ckpt_name, buckets=(16,))
    else:
        import jax
        import jax.numpy as jnp

        from pointnet2_tpu.models import MODEL_REGISTRY

        print("no --ckpt: running with RANDOM weights (pipeline demo; "
              "labels will be noise)")
        model = MODEL_REGISTRY["pointnet2_sem_seg"].cls()
        variables = jax.jit(lambda k, x: model.init(k, x))(
            jax.random.PRNGKey(0), jnp.zeros((1, 8192, 3), jnp.float32))
        pred = Predictor("pointnet2_sem_seg", variables, buckets=(16,))
    rng = np.random.default_rng(args.seed)
    pts, lbl = make_scene(rng, min_points=80_000, max_points=100_000)
    out = pred.predict_scene(pts, npoints=8192, seed=0)
    ann = lbl > 0
    acc = float((out["labels"][ann] == lbl[ann]).mean())
    print(f"scene points={len(pts)} annotated acc={acc:.4f} "
          f"votes min/max={out['votes'].min()}/{out['votes'].max()}")

    if args.out:
        from pointnet2_tpu.viz.viewer import render

        pal = np.asarray(
            [[60, 60, 60]] + [((37 * i) % 200 + 55, (91 * i) % 200 + 55,
                               (151 * i) % 200 + 55)
                              for i in range(1, 21)], np.uint8)
        keep = pts[:, 2] < pts[:, 2].max() * 0.8
        tiles = [render(pts[keep], pal[c[keep]], canvas=600, ballradius=3)
                 for c in (lbl, out["labels"])]
        from PIL import Image

        Image.fromarray(np.concatenate(tiles, 1)).save(args.out)
        print(f"wrote {args.out} (left: ground truth, right: prediction)")


if __name__ == "__main__":
    main()
