"""General conv/pool layer zoo for API-surface parity with utils/tf_util.py.

The PointNet++ models only ever use 1x1 convs (== Dense, see layers.py),
but the reference layer library also ships general convolutions, a
transposed conv, and pooling ops (utils/tf_util.py:52-326,366-466). These
thin Flax wrappers complete that capability surface with the same
defaults: xavier-uniform kernels, zero bias, optional scheduled-momentum
BN, ReLU.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from pointnet2_tpu.nn.layers import BatchNorm


class _ConvNd(nn.Module):
    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] | None = None
    padding: str = "SAME"
    bn: bool = False
    activation: Callable | None = nn.relu
    dtype: Any = None
    transpose: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False,
                 bn_momentum: jax.Array | float = 0.9):
        conv_cls = nn.ConvTranspose if self.transpose else nn.Conv
        x = conv_cls(
            self.features, kernel_size=tuple(self.kernel_size),
            strides=tuple(self.strides) if self.strides else None,
            padding=self.padding,
            kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype, param_dtype=jnp.float32)(x)
        if self.bn:
            x = BatchNorm(dtype=self.dtype)(x, train, bn_momentum)
        if self.activation is not None:
            x = self.activation(x)
        return x


class Conv1D(_ConvNd):
    """(B, L, C) convolution (tf_util.conv1d with kernel_size > 1)."""


class Conv2D(_ConvNd):
    """(B, H, W, C) convolution (tf_util.conv2d)."""


class Conv3D(_ConvNd):
    """(B, D, H, W, C) convolution (tf_util.conv3d)."""


class Conv2DTranspose(_ConvNd):
    """(B, H, W, C) transposed convolution (tf_util.conv2d_transpose)."""

    transpose: bool = True


def max_pool2d(x, kernel_size, stride=(2, 2), padding="VALID"):
    """(B, H, W, C) max pooling (tf_util.max_pool2d)."""
    return nn.max_pool(x, tuple(kernel_size), strides=tuple(stride),
                       padding=padding)


def avg_pool2d(x, kernel_size, stride=(2, 2), padding="VALID"):
    return nn.avg_pool(x, tuple(kernel_size), strides=tuple(stride),
                       padding=padding)


def max_pool3d(x, kernel_size, stride=(2, 2, 2), padding="VALID"):
    return nn.max_pool(x, tuple(kernel_size), strides=tuple(stride),
                       padding=padding)


def avg_pool3d(x, kernel_size, stride=(2, 2, 2), padding="VALID"):
    return nn.avg_pool(x, tuple(kernel_size), strides=tuple(stride),
                       padding=padding)
