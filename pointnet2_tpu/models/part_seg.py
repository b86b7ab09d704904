"""PointNet++ part segmentation (single-scale grouping).

Architecture parity with models/pointnet2_part_seg.py:17-41: input (B,N,6)
xyz+normal; 3x SA -> 3x FP (skip connections, last FP concatenates
[xyz, normals]) -> conv1d 128 -> drop0.5 -> conv1d 50.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from pointnet2_tpu.nn.layers import DenseBN
from pointnet2_tpu.nn.pointnet import FeaturePropagation, SetAbstraction


class PointNet2PartSeg(nn.Module):
    num_parts: int = 50
    dtype: Any = None

    @nn.compact
    def __call__(self, point_cloud, train: bool = False,
                 bn_momentum: jax.Array | float = 0.9):
        if point_cloud.shape[-1] < 6:
            raise ValueError(
                "part_seg expects (B, N, 6) xyz+normal input, got "
                f"{point_cloud.shape}")
        end_points = {}
        l0_xyz = point_cloud[..., :3]
        l0_points = point_cloud[..., 3:6]

        l1_xyz, l1_points, _ = SetAbstraction(
            512, 0.2, 64, (64, 64, 128), dtype=self.dtype, name="sa1")(
            l0_xyz, l0_points, train, bn_momentum)
        l2_xyz, l2_points, _ = SetAbstraction(
            128, 0.4, 64, (128, 128, 256), dtype=self.dtype, name="sa2")(
            l1_xyz, l1_points, train, bn_momentum)
        l3_xyz, l3_points, _ = SetAbstraction(
            None, None, None, (256, 512, 1024), group_all=True,
            dtype=self.dtype, name="sa3")(l2_xyz, l2_points, train, bn_momentum)

        l2_points = FeaturePropagation((256, 256), dtype=self.dtype, name="fp1")(
            l2_xyz, l3_xyz, l2_points, l3_points, train, bn_momentum)
        l1_points = FeaturePropagation((256, 128), dtype=self.dtype, name="fp2")(
            l1_xyz, l2_xyz, l1_points, l2_points, train, bn_momentum)
        l0_points = FeaturePropagation((128, 128, 128), dtype=self.dtype,
                                       name="fp3")(
            l0_xyz, l1_xyz,
            jnp.concatenate([l0_xyz, l0_points], axis=-1), l1_points,
            train, bn_momentum)

        net = DenseBN(128, dtype=self.dtype, name="fc1")(
            l0_points, train, bn_momentum)
        end_points["feats"] = net
        net = nn.Dropout(0.5, deterministic=not train)(net)
        net = DenseBN(self.num_parts, bn=False, activation=None,
                      name="fc2")(net, train, bn_momentum)
        return net.astype(jnp.float32), end_points
