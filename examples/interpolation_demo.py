"""Feature-propagation interpolation demo.

Headless counterpart of the reference's visual check
(tf_ops/3d_interpolation/visu_interpolation.py): scatters a sparse set of
colored control points, upsamples their colors to a dense grid with
three_nn + inverse-distance weights (exactly the FP-layer math,
utils/pointnet_util.py:211-216), and renders both as PNGs.

    python examples/interpolation_demo.py --out /tmp/interp_demo
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from pointnet2_tpu.ops import three_interpolate, three_nn
from pointnet2_tpu.viz import render


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="interp_demo")
    ap.add_argument("--sparse", type=int, default=32)
    ap.add_argument("--dense", type=int, default=4096)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    rng = np.random.default_rng(0)
    sparse_xyz = rng.uniform(-1, 1, (1, args.sparse, 3)).astype(np.float32)
    sparse_color = rng.uniform(0, 1, (1, args.sparse, 3)).astype(np.float32)
    g = int(round(args.dense ** (1 / 3)))
    if g ** 3 != args.dense:
        print(f"--dense {args.dense} rounded to the nearest cube: {g ** 3}")
    lin = np.linspace(-1, 1, g, dtype=np.float32)
    gx, gy, gz = np.meshgrid(lin, lin, lin)
    dense_xyz = np.stack([gx, gy, gz], -1).reshape(1, -1, 3)

    dist, idx = three_nn(jnp.asarray(dense_xyz), jnp.asarray(sparse_xyz))
    dist = jnp.maximum(dist, 1e-10)
    inv = 1.0 / dist
    weight = inv / jnp.sum(inv, axis=2, keepdims=True)
    dense_color = three_interpolate(jnp.asarray(sparse_color), idx, weight)

    img = render(sparse_xyz[0], (np.asarray(sparse_color[0]) * 255).astype(np.uint8),
                 canvas=600, ballradius=12)
    from PIL import Image

    Image.fromarray(img).save(os.path.join(args.out, "sparse.png"))
    img = render(dense_xyz[0],
                 (np.clip(np.asarray(dense_color[0]), 0, 1) * 255).astype(np.uint8),
                 canvas=600, ballradius=4)
    Image.fromarray(img).save(os.path.join(args.out, "dense_interpolated.png"))
    print(f"wrote {args.out}/sparse.png and dense_interpolated.png")


if __name__ == "__main__":
    main()
