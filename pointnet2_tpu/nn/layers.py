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


def _batch_stats(x, syncable: bool):
    """f32 batch mean/var over all axes but channels, pmean'd over the
    cross-replica BN axis when one is active (and `syncable`). The single
    source of the BN statistics semantics — used by BatchNorm.__call__ and
    BatchNorm.affine_coeffs."""
    xf = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(xf, axis=axes)
    meansq = jnp.mean(jnp.square(xf), axis=axes)
    axis_name = _BN_AXIS[-1]
    if axis_name is not None and syncable:
        mean = jax.lax.pmean(mean, axis_name)
        meansq = jax.lax.pmean(meansq, axis_name)
    var = jnp.maximum(meansq - jnp.square(mean), 0.0)
    return mean, var


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
            mean, var = _batch_stats(x, not self.is_initializing())
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

    def update_stats(self, mean, var, momentum):
        """Running-average update from externally computed batch statistics
        (the fused SA chain computes stats inside its Pallas kernels —
        ops/pallas/fused_mlp.py — and writes them back through here)."""
        if not self.is_mutable_collection("batch_stats"):
            if self.is_initializing():
                return
            # match the loud failure of the unfused __call__ path: a train
            # apply without mutable=['batch_stats'] must not silently skip
            # the running-stats update and later evaluate with init stats
            raise ValueError(
                "BatchNorm.update_stats in train mode requires "
                "mutable=['batch_stats'] in model.apply")
        m = jnp.asarray(momentum, jnp.float32)
        cur_mean = self.get_variable("batch_stats", "mean")
        cur_var = self.get_variable("batch_stats", "var")
        self.put_variable("batch_stats", "mean", cur_mean * m + mean * (1.0 - m))
        self.put_variable("batch_stats", "var", cur_var * m + var * (1.0 - m))

    def affine_coeffs(self, x, train: bool, momentum):
        """The BN transform as per-channel affine coefficients (a, b) f32,
        with BN(x) == x*a + b up to float reassociation.

        Computes (and in train mode updates) statistics exactly like
        __call__, but returns the coefficients instead of normalizing —
        so a consumer can commute a monotone reduction (max-pool) in front
        of the affine and skip the full-tensor normalize pass entirely
        (ConvBN.post_pooled_max). Requires an initialized module: __call__
        declares the variables."""
        scale = self.get_variable("params", "scale")
        bias = self.get_variable("params", "bias")
        if train:
            mean, var = _batch_stats(x, not self.is_initializing())
            if not self.is_initializing():  # as __call__: no init update
                self.update_stats(mean, var, momentum)
        else:
            mean = self.get_variable("batch_stats", "mean")
            var = self.get_variable("batch_stats", "var")
        a = scale * jax.lax.rsqrt(var + self.epsilon)
        return a, bias - mean * a


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

    def post_pooled_max(self, y, train: bool = False,
                        bn_momentum: jax.Array | float = 0.9, axis: int = -2):
        """``max_pool(post(y), axis)`` with the pool commuted before the BN.

        BN is a per-channel affine y*a + b and ReLU is monotone, so
        ``max relu(y*a+b) == relu(max_or_min(y)*a + b)`` exactly — max
        where a > 0, min where a < 0 (either for a == 0). The widest
        activation therefore skips the normalize+ReLU pass: only the dense
        output and two fused reductions touch it, and the affine runs on
        the pooled tensor. Gradient routing is identical to the unfused
        path: max/min route first-occurrence through ops.max_pool, and the
        monotone affine preserves arg-extremum positions (ReLU-clamped
        windows get zero gradient either way).

        Requires bn=True and ReLU activation; used for the ``max`` pooling
        mode of the SA stacks (utils/pointnet_util.py:126-127)."""
        from pointnet2_tpu.ops.pooling import max_pool

        assert self.bn and self.activation is nn.relu
        a, b = self.norm.affine_coeffs(y, train, bn_momentum)
        hi = max_pool(y, axis)
        lo = -max_pool(-y, axis)
        sel = jnp.where(a > 0, hi.astype(jnp.float32), lo.astype(jnp.float32))
        return jax.nn.relu(sel * a + b).astype(self.dtype or y.dtype)

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

    def pooled_max_supported(self) -> bool:
        """Whether the pool-before-affine tail applies (BN + ReLU chain)."""
        from pointnet2_tpu import config

        return (self.bn and not self.is_initializing()
                and config.pooled_max_enabled())

    def finish_first_pooled(self, x, train: bool = False,
                            bn_momentum: jax.Array | float = 0.9,
                            axis: int = -2):
        """``max_pool(finish_first(x), axis)`` with the last layer's
        BN+ReLU commuted after the pool (ConvBN.post_pooled_max)."""
        if len(self.blocks) == 1:
            # single layer: x is already that layer's pre-BN dense output
            return self.blocks[0].post_pooled_max(x, train, bn_momentum,
                                                  axis)
        x = self.blocks[0].post(x, train, bn_momentum)
        for block in self.blocks[1:-1]:
            x = block(x, train, bn_momentum)
        last = self.blocks[-1]
        return last.post_pooled_max(last.dense(x), train, bn_momentum, axis)

    def call_pooled(self, x, train: bool = False,
                    bn_momentum: jax.Array | float = 0.9, axis: int = -2):
        """``max_pool(self(x), axis)`` with the pool-before-affine tail."""
        for block in self.blocks[:-1]:
            x = block(x, train, bn_momentum)
        last = self.blocks[-1]
        return last.post_pooled_max(last.dense(x), train, bn_momentum, axis)

    def fused_tail_supported(self, x, pool: bool) -> bool:
        """Whether `fused_tail` can run this chain (see ops/pallas/fused_mlp).

        Requires BN on, >=2 layers (the chain needs at least one dense after
        the lifted layer 0), an initialized module, the config gate, and
        kernel-eligible shapes/dtype. All blocks built by SharedMLP use the
        default ReLU activation, which the kernels assume."""
        from pointnet2_tpu import config
        from pointnet2_tpu.ops.pallas import fused_mlp

        return (self.bn
                and not self.is_initializing()
                and config.fused_mlp_enabled()
                and len(self.features) >= 2
                and pool
                and fused_mlp.fused_chain_eligible(
                    x.shape, x.dtype, len(self.features) - 1))

    def fused_tail(self, x, train: bool = False,
                   bn_momentum: jax.Array | float = 0.9, pool: bool = True):
        """Fused-kernel equivalent of ``finish_first`` + max-pool(axis=-2).

        ``x`` is the pre-BN_0 tensor (B, M, S, mlp[0]) — the lifted first
        dense's gathered output. Runs the whole BN_0 -> (dense_k + BN_k)_k
        -> max-pool chain as Pallas kernels (ops/pallas/fused_mlp.py): BN
        statistics accumulate inside the matmul passes and the widest
        activation never round-trips HBM. Semantics match the unfused path
        (same stats, same scheduled-momentum running update, same
        first-occurrence pool-gradient routing) up to float reassociation.
        """
        from pointnet2_tpu.ops.pallas import fused_mlp

        denses, scales, biases, running = [], [], [], []
        for i, block in enumerate(self.blocks):
            v = block.variables
            norm_p = v["params"]["norm"]
            scales.append(norm_p["scale"])
            biases.append(norm_p["bias"])
            norm_s = v["batch_stats"]["norm"]
            running.append((norm_s["mean"], norm_s["var"]))
            if i > 0:
                dense_p = v["params"]["dense"]
                denses.append((dense_p["kernel"], dense_p["bias"]))
        cfg = fused_mlp.ChainConfig(
            eps=self.blocks[0].norm.epsilon,
            axis_name=_BN_AXIS[-1] if train else None,
            pool=pool)
        if train:
            out, stats = fused_mlp.fused_chain_train(
                cfg, x, tuple(denses), tuple(scales), tuple(biases))
            for block, (mean, var) in zip(self.blocks, stats):
                block.norm.update_stats(mean, var, bn_momentum)
            return out
        return fused_mlp.fused_chain_eval(
            cfg, x, tuple(denses), tuple(scales), tuple(biases),
            tuple(running))

    def __call__(self, x, train: bool = False,
                 bn_momentum: jax.Array | float = 0.9):
        for block in self.blocks:
            x = block(x, train, bn_momentum)
        return x
