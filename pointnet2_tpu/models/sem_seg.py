"""PointNet++ semantic segmentation (ScanNet).

Architecture parity with models/pointnet2_sem_seg.py:18-45: 4x SA
(1024/256/64/16 points, radii 0.1/0.2/0.4/0.8, nsample 32) -> 4x FP ->
conv1d 128 -> drop0.5 -> conv1d num_class. Loss is the weighted CE
(weights = per-point sample weights, models/pointnet2_sem_seg.py:48-55).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from pointnet2_tpu.nn.layers import DenseBN
from pointnet2_tpu.nn.pointnet import FeaturePropagation, SetAbstraction


class PointNet2SemSeg(nn.Module):
    num_classes: int = 21
    dtype: Any = None

    @nn.compact
    def __call__(self, point_cloud, train: bool = False,
                 bn_momentum: jax.Array | float = 0.9):
        end_points = {}
        l0_xyz = point_cloud[..., :3]
        l0_points = None

        l1_xyz, l1_points, _ = SetAbstraction(
            1024, 0.1, 32, (32, 32, 64), dtype=self.dtype, name="sa1")(
            l0_xyz, l0_points, train, bn_momentum)
        l2_xyz, l2_points, _ = SetAbstraction(
            256, 0.2, 32, (64, 64, 128), dtype=self.dtype, name="sa2")(
            l1_xyz, l1_points, train, bn_momentum)
        l3_xyz, l3_points, _ = SetAbstraction(
            64, 0.4, 32, (128, 128, 256), dtype=self.dtype, name="sa3")(
            l2_xyz, l2_points, train, bn_momentum)
        l4_xyz, l4_points, _ = SetAbstraction(
            16, 0.8, 32, (256, 256, 512), dtype=self.dtype, name="sa4")(
            l3_xyz, l3_points, train, bn_momentum)

        l3_points = FeaturePropagation((256, 256), dtype=self.dtype, name="fp1")(
            l3_xyz, l4_xyz, l3_points, l4_points, train, bn_momentum)
        l2_points = FeaturePropagation((256, 256), dtype=self.dtype, name="fp2")(
            l2_xyz, l3_xyz, l2_points, l3_points, train, bn_momentum)
        l1_points = FeaturePropagation((256, 128), dtype=self.dtype, name="fp3")(
            l1_xyz, l2_xyz, l1_points, l2_points, train, bn_momentum)
        l0_points = FeaturePropagation((128, 128, 128), dtype=self.dtype,
                                       name="fp4")(
            l0_xyz, l1_xyz, None, l1_points, train, bn_momentum)

        net = DenseBN(128, dtype=self.dtype, name="fc1")(
            l0_points, train, bn_momentum)
        end_points["feats"] = net
        net = nn.Dropout(0.5, deterministic=not train)(net)
        net = DenseBN(self.num_classes, bn=False, activation=None,
                      name="fc2")(net, train, bn_momentum)
        return net.astype(jnp.float32), end_points
