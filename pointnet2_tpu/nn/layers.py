"""Base layers: batch norm with scheduled momentum, Dense+BN+ReLU blocks.

Functional re-design of the reference layer zoo (utils/tf_util.py). The
reference's conv1d/conv2d with 1x1 kernels over (B, npoint, nsample, C)
tensors are all channelwise matmuls, so everything here is a Dense over the
last axis — which XLA maps straight onto the MXU in one large batched
matmul per layer (the FLOPs hot loop, utils/tf_util.py:120-185).

Parity notes:
- Xavier(glorot)-uniform kernel init, zero bias (tf_util.py:41-49,104-106).
- BatchNorm: beta/gamma trained, eps=1e-3, batch stats over all axes but
  channels; running stats updated with a *scheduled* momentum (the bn_decay
  schedule, train.py:96-104) — momentum is a call-time argument, not a
  module constant. Default momentum 0.9 matches batch_norm_template's
  `bn_decay if bn_decay is not None else 0.9` (tf_util.py:521).
- Statistics are always computed in float32 even under bf16 compute.
"""

from __future__ import annotations

import contextlib
from collections.abc import Callable, Sequence
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

# Cross-replica BN sync. When a data-parallel train step traces the model
# under shard_map, it wraps the apply in `cross_replica_bn(axis)`; BatchNorm
# then pmeans E[x] and E[x^2] over that axis so normalization (and hence the
# whole step) is bitwise-independent of the device count. This is a
# deliberate improvement over the reference's per-tower statistics
# (utils/tf_util.py:512-531 + train_multi_gpu.py:190), which degrade at
# small per-device batches. Trace-time state, not runtime state.
_BN_AXIS: list[str | None] = [None]


@contextlib.contextmanager
def cross_replica_bn(axis_name: str | None):
    _BN_AXIS.append(axis_name)
    try:
        yield
    finally:
        _BN_AXIS.pop()


class BatchNorm(nn.Module):
    """Batch normalization with call-time momentum (for the bn_decay schedule)."""

    epsilon: float = 1e-3
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool, momentum: jax.Array | float = 0.9):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((C,), jnp.float32))

        if train:
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axis=axes)
            meansq = jnp.mean(jnp.square(xf), axis=axes)
            axis_name = _BN_AXIS[-1]
            if axis_name is not None and not self.is_initializing():
                mean = jax.lax.pmean(mean, axis_name)
                meansq = jax.lax.pmean(meansq, axis_name)
            var = jnp.maximum(meansq - jnp.square(mean), 0.0)
            if not self.is_initializing():
                # moving = moving*decay + batch*(1-decay)  (tf contrib semantics)
                m = jnp.asarray(momentum, jnp.float32)
                ra_mean.value = ra_mean.value * m + mean * (1.0 - m)
                ra_var.value = ra_var.value * m + var * (1.0 - m)
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(self.dtype or x.dtype)


class ConvBN(nn.Module):
    """Dense (== 1x1 conv) + optional BN + activation over the channel axis.

    Replaces tf_util.conv1d/conv2d with 1x1 kernels (utils/tf_util.py:52-185):
    on TPU a shared point MLP is one big (B*npoint*nsample, Cin)x(Cin, Cout)
    matmul on the MXU. The linear part is exposed separately (``dense`` /
    ``post``) so SetAbstraction can lift the first matmul through the
    neighbor gather (dense commutes with row gathers — see nn/pointnet.py).
    """

    features: int
    bn: bool = True
    activation: Callable | None = nn.relu
    dtype: Any = None

    def setup(self):
        self.dense = nn.Dense(
            self.features,
            kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )
        self.norm = BatchNorm(dtype=self.dtype)

    def post(self, x, train: bool = False,
             bn_momentum: jax.Array | float = 0.9):
        """The non-linear tail (BN + activation) after the dense."""
        if self.bn:
            x = self.norm(x, train, bn_momentum)
        if self.activation is not None:
            x = self.activation(x)
        return x

    def __call__(self, x, train: bool = False,
                 bn_momentum: jax.Array | float = 0.9):
        return self.post(self.dense(x), train, bn_momentum)


# The reference distinguishes conv (on point grids) from fully_connected
# (tf_util.py:327-363); on TPU both are the same Dense block.
DenseBN = ConvBN


class SharedMLP(nn.Module):
    """A stack of ConvBN layers applied pointwise (the per-point MLP).

    ``lift_first`` / ``finish_first`` split layer 0 around its dense so a
    caller can apply the first matmul on the un-gathered point set and the
    rest on the gathered neighbor tensor (see SetAbstraction)."""

    features: Sequence[int]
    bn: bool = True
    dtype: Any = None

    def setup(self):
        self.blocks = [
            ConvBN(f, bn=self.bn, dtype=self.dtype, name=f"conv{i}")
            for i, f in enumerate(self.features)
        ]

    def lift_first(self, x):
        """Apply only layer 0's dense (linear: commutes with gathers).

        For f32 inputs the matmul runs at explicit float32 precision: the
        caller subtracts a lifted center term (gW - cW), and the TPU's
        default bf16 matmul rounding would be amplified by that
        cancellation. The lift runs on the un-gathered N points, so the
        extra precision is ~free."""
        if x.dtype == jnp.float32:
            with jax.default_matmul_precision("float32"):
                return self.blocks[0].dense(x)
        return self.blocks[0].dense(x)

    def finish_first(self, x, train: bool = False,
                     bn_momentum: jax.Array | float = 0.9):
        """Layer 0's BN+activation, then the remaining layers."""
        x = self.blocks[0].post(x, train, bn_momentum)
        for block in self.blocks[1:]:
            x = block(x, train, bn_momentum)
        return x

    def __call__(self, x, train: bool = False,
                 bn_momentum: jax.Array | float = 0.9):
        for block in self.blocks:
            x = block(x, train, bn_momentum)
        return x
