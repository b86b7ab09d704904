"""PointNet++ single-scale-grouping classifier.

Architecture parity with models/pointnet2_cls_ssg.py:20-44:
SA(512, 0.2, 32, [64,64,128]) -> SA(128, 0.4, 64, [128,128,256]) ->
SA(group_all, [256,512,1024]) -> FC512 -> drop0.5 -> FC256 -> drop0.5 -> FC40.

Accepts (B, N, 3) clouds or (B, N, 3+C) with extra channels (normals) used
as initial point features.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax

from pointnet2_tpu.nn.layers import DenseBN
from pointnet2_tpu.nn.pointnet import SetAbstraction


class PointNet2ClsSSG(nn.Module):
    num_classes: int = 40
    dtype: Any = None

    @nn.compact
    def __call__(self, point_cloud, train: bool = False,
                 bn_momentum: jax.Array | float = 0.9):
        l0_xyz = point_cloud[..., :3]
        l0_points = point_cloud[..., 3:] if point_cloud.shape[-1] > 3 else None
        end_points = {"l0_xyz": l0_xyz}

        l1_xyz, l1_points, _ = SetAbstraction(
            512, 0.2, 32, (64, 64, 128), dtype=self.dtype, name="sa1")(
            l0_xyz, l0_points, train, bn_momentum)
        l2_xyz, l2_points, _ = SetAbstraction(
            128, 0.4, 64, (128, 128, 256), dtype=self.dtype, name="sa2")(
            l1_xyz, l1_points, train, bn_momentum)
        _, l3_points, _ = SetAbstraction(
            None, None, None, (256, 512, 1024), group_all=True,
            dtype=self.dtype, name="sa3")(l2_xyz, l2_points, train, bn_momentum)

        net = l3_points.reshape(l3_points.shape[0], -1)
        net = DenseBN(512, dtype=self.dtype, name="fc1")(net, train, bn_momentum)
        net = nn.Dropout(0.5, deterministic=not train)(net)
        net = DenseBN(256, dtype=self.dtype, name="fc2")(net, train, bn_momentum)
        net = nn.Dropout(0.5, deterministic=not train)(net)
        net = DenseBN(self.num_classes, bn=False, activation=None,
                      name="fc3")(net, train, bn_momentum)
        return net.astype(jax.numpy.float32), end_points
