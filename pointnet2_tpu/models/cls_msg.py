"""PointNet++ multi-scale-grouping classifier.

Architecture parity with models/pointnet2_cls_msg.py:17-39:
MSG(512, [0.1,0.2,0.4], [16,32,128], [[32,32,64],[64,64,128],[64,96,128]]) ->
MSG(128, [0.2,0.4,0.8], [32,64,128], [[64,64,128],[128,128,256],[128,128,256]])
-> SA(group_all, [256,512,1024]) -> FC512 -> drop0.4 -> FC256 -> drop0.4 -> FC40.

The 5000-point XYZ+normal recipe (README.md:59) uses nsample=128 in the
first two layers — configurable via `sa1_nsample`/`sa2_nsample`.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax

from pointnet2_tpu.nn.layers import DenseBN
from pointnet2_tpu.nn.pointnet import SetAbstraction, SetAbstractionMSG


class PointNet2ClsMSG(nn.Module):
    num_classes: int = 40
    sa1_nsample: tuple[int, int, int] = (16, 32, 128)
    sa2_nsample: tuple[int, int, int] = (32, 64, 128)
    dtype: Any = None

    @nn.compact
    def __call__(self, point_cloud, train: bool = False,
                 bn_momentum: jax.Array | float = 0.9):
        l0_xyz = point_cloud[..., :3]
        l0_points = point_cloud[..., 3:] if point_cloud.shape[-1] > 3 else None
        end_points = {}

        l1_xyz, l1_points = SetAbstractionMSG(
            512, (0.1, 0.2, 0.4), self.sa1_nsample,
            ((32, 32, 64), (64, 64, 128), (64, 96, 128)),
            dtype=self.dtype, name="sa1")(l0_xyz, l0_points, train, bn_momentum)
        l2_xyz, l2_points = SetAbstractionMSG(
            128, (0.2, 0.4, 0.8), self.sa2_nsample,
            ((64, 64, 128), (128, 128, 256), (128, 128, 256)),
            dtype=self.dtype, name="sa2")(l1_xyz, l1_points, train, bn_momentum)
        _, l3_points, _ = SetAbstraction(
            None, None, None, (256, 512, 1024), group_all=True,
            dtype=self.dtype, name="sa3")(l2_xyz, l2_points, train, bn_momentum)

        net = l3_points.reshape(l3_points.shape[0], -1)
        net = DenseBN(512, dtype=self.dtype, name="fc1")(net, train, bn_momentum)
        net = nn.Dropout(0.6, deterministic=not train)(net)  # keep_prob 0.4
        net = DenseBN(256, dtype=self.dtype, name="fc2")(net, train, bn_momentum)
        net = nn.Dropout(0.6, deterministic=not train)(net)  # keep_prob 0.4
        net = DenseBN(self.num_classes, bn=False, activation=None,
                      name="fc3")(net, train, bn_momentum)
        return net.astype(jax.numpy.float32), end_points
