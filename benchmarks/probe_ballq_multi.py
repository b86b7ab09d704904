"""On-chip probe: fused multi-radius ball query vs 3 independent kernels.

Quantifies what the distance-tile fusion (ops/pallas/ball_query.py
ball_query_multi_pallas) actually saves at the MSG shapes: the shared
(TM, N) d2 tile costs ~8 VPU ops per (query, lane) while each radius's
slot extraction costs ~2*nsample ops — so at nsample=128 the tile is
~2% of the work and at nsample=16/32/128 (cls_msg) ~8%.

Run (chip): python benchmarks/probe_ballq_multi.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

import jax.numpy as jnp
import numpy as np

from pointnet2_tpu.ops import query_ball_point, query_ball_point_multi
from pointnet2_tpu.utils.profiling import time_op_loop

# (tag, B, N, M, radii, nsamples)
SHAPES = [
    ("msg5k_sa1", 8, 5000, 512, (0.1, 0.2, 0.4), (128, 128, 128)),
    ("msg5k_sa2", 8, 512, 128, (0.2, 0.4, 0.8), (128, 128, 128)),
    ("clsmsg_sa1", 16, 1024, 512, (0.1, 0.2, 0.4), (16, 32, 128)),
    ("clsmsg_sa2", 16, 512, 128, (0.2, 0.4, 0.8), (32, 64, 128)),
]


def main() -> None:
    rng = np.random.RandomState(0)
    res = {}
    for tag, B, N, M, radii, nsamples in SHAPES:
        xyz1 = jnp.asarray(rng.rand(B, N, 3).astype(np.float32))
        xyz2 = jnp.asarray(rng.rand(B, M, 3).astype(np.float32))

        def separate(x):
            outs = [query_ball_point(r, ns, x, xyz2, impl="pallas")
                    for r, ns in zip(radii, nsamples)]
            return [o[0] for o in outs] + [o[1] for o in outs]

        def fused(x):
            outs = query_ball_point_multi(radii, nsamples, x, xyz2,
                                          impl="pallas")
            return [o[0] for o in outs] + [o[1] for o in outs]

        sep = time_op_loop(separate, xyz1, iters=30) * 1e3
        fus = time_op_loop(fused, xyz1, iters=30) * 1e3
        row = {"separate_ms": round(sep, 3), "fused_ms": round(fus, 3),
               "saved_ms": round(sep - fus, 3),
               "speedup": round(sep / max(fus, 1e-9), 3)}
        res[tag] = row
        print(tag, json.dumps(row), flush=True)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
