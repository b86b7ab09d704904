"""PointNet v1 baseline classifier.

Architecture parity with models/pointnet_cls_basic.py:21-64: per-point MLP
(64,64,64,128,1024) -> global max-pool -> FC512 -> FC256 -> drop0.7 -> FC40.
The reference's conv2d [1,3] first layer over (B,N,3,1) is exactly a Dense
over the 3 coords.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from pointnet2_tpu.nn.layers import DenseBN, SharedMLP
from pointnet2_tpu.ops import max_pool


class PointNetClsBasic(nn.Module):
    num_classes: int = 40
    dtype: Any = None

    @nn.compact
    def __call__(self, point_cloud, train: bool = False,
                 bn_momentum: jax.Array | float = 0.9):
        end_points = {}
        net = point_cloud
        if self.dtype is not None:
            net = net.astype(self.dtype)
        point_mlp = SharedMLP((64, 64, 64, 128, 1024), dtype=self.dtype,
                              name="point_mlp")
        if point_mlp.pooled_max_supported():
            # symmetric function: global max-pool, commuted before the
            # last BN affine (ConvBN.post_pooled_max) so the (B, N, 1024)
            # tensor skips its normalize pass
            net = point_mlp.call_pooled(net, train, bn_momentum, axis=1)
        else:
            net = point_mlp(net, train, bn_momentum)
            net = max_pool(net, 1)
        net = DenseBN(512, dtype=self.dtype, name="fc1")(net, train, bn_momentum)
        net = DenseBN(256, dtype=self.dtype, name="fc2")(net, train, bn_momentum)
        net = nn.Dropout(0.3, deterministic=not train)(net)  # keep_prob 0.7
        net = DenseBN(self.num_classes, bn=False, activation=None,
                      name="fc3")(net, train, bn_momentum)
        return net.astype(jnp.float32), end_points
