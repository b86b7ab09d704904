"""Tests for the fused SA-chain kernels (ops/pallas/fused_mlp.py).

The fused chain is an optional execution path (config.set_fused_mlp) —
off by default after benchmarking (see the module docstring) but kept
correct. Golden reference: the unfused layer math (BatchNorm semantics of
nn.layers + first-occurrence max_pool routing of ops.pooling).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointnet2_tpu import config
from pointnet2_tpu.nn.pointnet import SetAbstraction
from pointnet2_tpu.ops.pallas.fused_mlp import (
    ChainConfig,
    fused_chain_eligible,
    fused_chain_eval,
    fused_chain_train,
)
from pointnet2_tpu.ops.pooling import max_pool

EPS = 1e-3


def _unfused(x, denses, scales, biases, train, running=None, pool=True):
    stats = []

    def bn(y, j):
        yf = y.astype(jnp.float32)
        if train:
            axes = tuple(range(y.ndim - 1))
            mean = jnp.mean(yf, axis=axes)
            meansq = jnp.mean(jnp.square(yf), axis=axes)
            var = jnp.maximum(meansq - jnp.square(mean), 0.0)
        else:
            mean, var = running[j]
        stats.append((mean, var))
        out = (yf - mean) * jax.lax.rsqrt(var + EPS)
        out = out * scales[j] + biases[j]
        return jnp.maximum(out, 0.0).astype(y.dtype)

    cur = bn(x, 0)
    for k, (w, b) in enumerate(denses):
        y = jnp.dot(cur, w.astype(cur.dtype),
                    preferred_element_type=jnp.float32)
        y = (y + b).astype(cur.dtype)
        cur = bn(y, k + 1)
    return (max_pool(cur, 2) if pool else cur), stats


def _make_chain(rng, c0, feats):
    denses, scales, biases, running = [], [], [], []
    cin = c0
    for c in [c0] + feats:
        scales.append(jnp.asarray(rng.rand(c).astype(np.float32)) + 0.5)
        biases.append(jnp.asarray(rng.randn(c).astype(np.float32)) * 0.1)
        running.append((jnp.asarray(rng.randn(c).astype(np.float32)) * 0.1,
                        jnp.asarray(rng.rand(c).astype(np.float32)) + 0.5))
    for f in feats:
        denses.append((
            jnp.asarray(rng.randn(cin, f).astype(np.float32) / np.sqrt(cin)),
            jnp.asarray(rng.randn(f).astype(np.float32)) * 0.1))
        cin = f
    return (tuple(denses), tuple(scales), tuple(biases), tuple(running))


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 1e-4),
                                       (jnp.bfloat16, 4e-2)])
@pytest.mark.parametrize("pool", [True, False])
def test_chain_matches_unfused(rng, dtype, tol, pool):
    B, M, S, C0 = 2, 4, 16, 8
    feats = [8, 16]
    x = jnp.asarray(rng.randn(B, M, S, C0).astype(np.float32)).astype(dtype)
    denses, scales, biases, running = _make_chain(rng, C0, feats)
    assert fused_chain_eligible(x.shape, dtype, len(denses))
    cfg = ChainConfig(eps=EPS, axis_name=None, pool=pool)

    out_f, stats_f = jax.jit(
        lambda x, d, s, b: fused_chain_train(cfg, x, d, s, b))(
            x, denses, scales, biases)
    out_r, stats_r = _unfused(x, denses, scales, biases, train=True,
                              pool=pool)
    np.testing.assert_allclose(out_f.astype(jnp.float32),
                               out_r.astype(jnp.float32), atol=tol, rtol=tol)
    for (mf, vf), (mr, vr) in zip(stats_f, stats_r):
        np.testing.assert_allclose(mf, mr, atol=tol, rtol=tol)
        np.testing.assert_allclose(vf, vr, atol=tol, rtol=tol)

    oe_f = jax.jit(lambda x, d, s, b: fused_chain_eval(
        cfg, x, d, s, b, running))(x, denses, scales, biases)
    oe_r, _ = _unfused(x, denses, scales, biases, train=False,
                       running=running, pool=pool)
    np.testing.assert_allclose(oe_f.astype(jnp.float32),
                               oe_r.astype(jnp.float32), atol=tol, rtol=tol)


@pytest.mark.parametrize("pool", [True, False])
def test_chain_grads_match_unfused(rng, pool):
    B, M, S, C0 = 2, 4, 16, 8
    feats = [8, 16]
    x = jnp.asarray(rng.randn(B, M, S, C0).astype(np.float32))
    denses, scales, biases, _ = _make_chain(rng, C0, feats)
    cfg = ChainConfig(eps=EPS, axis_name=None, pool=pool)
    tgt_shape = (B, M, feats[-1]) if pool else (B, M, S, feats[-1])
    tgt = jnp.asarray(rng.randn(*tgt_shape).astype(np.float32))

    def loss_f(x, d, s, b):
        out, _ = fused_chain_train(cfg, x, d, s, b)
        return jnp.sum((out.astype(jnp.float32) - tgt) ** 2)

    def loss_r(x, d, s, b):
        out, _ = _unfused(x, d, s, b, train=True, pool=pool)
        return jnp.sum((out.astype(jnp.float32) - tgt) ** 2)

    gf = jax.jit(jax.grad(loss_f, argnums=(0, 1, 2, 3)))(
        x, denses, scales, biases)
    gr = jax.jit(jax.grad(loss_r, argnums=(0, 1, 2, 3)))(
        x, denses, scales, biases)
    # overall gradient magnitude sets the tolerance floor: dense-bias grads
    # are analytically ~0 under BN (a constant shift is absorbed by the
    # mean), so comparing them is noise-vs-noise — use one scale per group
    for a_, b_ in zip(gf, gr):
        la = jax.tree_util.tree_leaves(a_)
        lb = jax.tree_util.tree_leaves(b_)
        scale = max(float(jnp.max(jnp.abs(leaf))) for leaf in lb) + 1e-6
        for x_, y_ in zip(la, lb):
            diff = float(jnp.max(jnp.abs(x_ - y_)))
            assert diff / scale < 2e-4, (diff, scale)


@pytest.mark.parametrize("dtype", [jnp.float32])
def test_sa_module_fused_matches_unfused(rng, dtype):
    B, N = 2, 256
    xyz = jnp.asarray(rng.rand(B, N, 3).astype(np.float32))
    mod = SetAbstraction(npoint=64, radius=0.2, nsample=16,
                         mlp=[16, 16, 32], dtype=None)
    with config.fused_mlp(False):
        variables = mod.init(jax.random.PRNGKey(0), xyz, None, train=False)

    def run(fused, train):
        with config.fused_mlp(fused):
            (nx, pts, idx), mut = mod.apply(
                variables, xyz, None, train=train, bn_momentum=0.9,
                mutable=["batch_stats"])
        return pts, mut

    for train in (True, False):
        p0, m0 = run(False, train)
        p1, m1 = run(True, train)
        np.testing.assert_allclose(p0, p1, atol=2e-4, rtol=2e-4)
        for a, b in zip(jax.tree_util.tree_leaves(m0),
                        jax.tree_util.tree_leaves(m1)):
            np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)


def test_chain_cross_replica_matches_global(rng):
    """With the BN axis set, a sharded chain must equal the global-batch
    chain (device-count invariance of the synced statistics)."""
    from jax.sharding import Mesh, PartitionSpec as P
    shard_map = jax.shard_map

    n_dev = min(4, len(jax.devices()))
    if n_dev < 2:
        pytest.skip("needs >=2 devices")
    B, M, S, C0 = 2 * n_dev, 4, 16, 8
    feats = [8]
    x = jnp.asarray(rng.randn(B, M, S, C0).astype(np.float32))
    denses, scales, biases, _ = _make_chain(rng, C0, feats)

    cfg_g = ChainConfig(eps=EPS, axis_name=None, pool=True)
    out_g, stats_g = fused_chain_train(cfg_g, x, denses, scales, biases)

    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("data",))
    cfg_s = ChainConfig(eps=EPS, axis_name="data", pool=True)

    @jax.jit
    def sharded(x, d, s, b):
        f = shard_map(
            lambda x, d, s, b: fused_chain_train(cfg_s, x, d, s, b),
            mesh=mesh,
            in_specs=(P("data"), P(), P(), P()),
            out_specs=(P("data"), P()),
            check_vma=False,  # as the trainer does (train/steps.py)
        )
        return f(x, d, s, b)

    out_s, stats_s = sharded(x, denses, scales, biases)
    np.testing.assert_allclose(out_g, out_s, atol=1e-5, rtol=1e-5)
    for (mg, vg), (ms, vs) in zip(stats_g, stats_s):
        np.testing.assert_allclose(mg, ms, atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(vg, vs, atol=1e-5, rtol=1e-5)
