"""Area-weighted mesh sampling demo.

Headless counterpart of the reference's __main__ demo in
tf_ops/sampling/tf_sampling.py:60-89: draw surface points on a triangle
mesh with probability proportional to triangle area, then FPS-reduce to a
uniform subset — all in one jitted call (ops.sample_mesh). Renders the
oversampled and reduced clouds as PNGs.

    python examples/mesh_sampling_demo.py --out /tmp/mesh_demo
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from pointnet2_tpu.ops import sample_mesh
from pointnet2_tpu.viz import render


def icosahedron(scale: float = 1.0) -> np.ndarray:
    """(1, 20, 3, 3) triangle corners of a unit icosahedron."""
    phi = (1 + 5 ** 0.5) / 2
    v = np.array([[-1, phi, 0], [1, phi, 0], [-1, -phi, 0], [1, -phi, 0],
                  [0, -1, phi], [0, 1, phi], [0, -1, -phi], [0, 1, -phi],
                  [phi, 0, -1], [phi, 0, 1], [-phi, 0, -1], [-phi, 0, 1]],
                 np.float32)
    v *= scale / np.linalg.norm(v[0])
    f = np.array([[0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
                  [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
                  [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
                  [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]])
    return v[f][None]  # (1, 20, 3, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="mesh_demo")
    ap.add_argument("--oversample", type=int, default=8192)
    ap.add_argument("--npoint", type=int, default=1024)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    tris = icosahedron()
    key = jax.random.PRNGKey(100)
    dense = np.asarray(sample_mesh(tris, args.oversample, key))
    reduced = np.asarray(
        sample_mesh(tris, args.oversample, key, npoint=args.npoint))
    print("dense:", dense.shape, "reduced:", reduced.shape)

    for name, pts in [("dense", dense[0]), ("reduced", reduced[0])]:
        img = render(pts)  # RGB, as the other demos save via PIL
        path = os.path.join(args.out, f"{name}.png")
        try:
            from PIL import Image

            Image.fromarray(img).save(path)
        except ImportError:
            path += ".npy"
            np.save(path, img)
        print("wrote", path)


if __name__ == "__main__":
    main()
