"""On-chip probe: group_point implementation crossover in dataset size N.

The one-hot MXU gather costs ~B*K*N*C flops (it contracts over ALL N
dataset rows); a native XLA gather costs ~output bytes. The mxu default was
chosen at cls shapes (N=1024) — this probe measures fwd and bwd at the
sem-seg sa1 shape (N=8192) and the MSG-5k shapes to find the crossover.
Run: python benchmarks/probe_gather.py"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from pointnet2_tpu.ops import group_point
from pointnet2_tpu.utils.profiling import time_op_loop

# (tag, B, N, M, S, C)
SHAPES = [
    ("cls_sa1", 32, 1024, 512, 32, 32),
    ("cls_sa2", 32, 512, 128, 64, 128),
    ("semseg_sa1", 16, 8192, 1024, 32, 32),
    ("semseg_sa2", 16, 1024, 256, 32, 64),
    ("msg5k_sa1", 8, 5000, 512, 128, 32),
    ("msg5k_sa2", 8, 512, 128, 128, 64),
    ("partseg_sa1", 16, 2048, 512, 32, 64),
]


def main():
    rng = np.random.RandomState(0)
    res = {}
    for tag, B, N, M, S, C in SHAPES:
        feats = jnp.asarray(rng.rand(B, N, C).astype(np.float32)).astype(
            jnp.bfloat16)
        idx = jnp.asarray(rng.randint(0, N, (B, M, S)).astype(np.int32))
        row = {}
        for impl in ("mxu", "xla", "pallas"):
            try:
                fwd = round(time_op_loop(
                    lambda f, impl=impl: group_point(f, idx, impl=impl),
                    feats, iters=30) * 1e3, 3)

                def vag(f, impl=impl):
                    # square the gathered values so the cotangent depends
                    # on f — grad of a plain sum is input-independent and
                    # XLA hoists the whole backward out of the timing loop
                    return jax.grad(lambda q: jnp.sum(jnp.square(
                        group_point(q, idx, impl=impl)
                        .astype(jnp.float32))))(f)

                bwd = round(time_op_loop(vag, feats, iters=30) * 1e3, 3)
            except Exception as e:
                row[impl] = f"error: {type(e).__name__}"
                continue
            row[impl] = {"fwd_ms": fwd, "fwd_bwd_ms": bwd}
        # cross-impl correctness at this shape
        a = group_point(feats, idx, impl="mxu").astype(jnp.float32)
        b = group_point(feats, idx, impl="xla").astype(jnp.float32)
        row["err"] = float(jnp.max(jnp.abs(a - b)))
        res[tag] = row
        print(tag, json.dumps(row), flush=True)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
