"""Tests for the pool-before-affine SA tail (ConvBN.post_pooled_max).

max-pooling commutes with the BN affine + ReLU exactly (select max or min
per channel by the sign of the BN scale), so the default SA paths now pool
the *pre-BN* dense output. These tests pin the equivalence to the plain
finish_first/__call__ + max_pool composition, including gradients and
running-stat updates.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointnet2_tpu.nn.layers import SharedMLP
from pointnet2_tpu.nn.pointnet import SetAbstraction, SetAbstractionMSG
from pointnet2_tpu.ops.pooling import max_pool


@pytest.mark.parametrize("train", [False, True])
def test_shared_mlp_pooled_tail_matches(rng, train):
    x = jnp.asarray(rng.randn(2, 8, 16, 12).astype(np.float32))
    mod = SharedMLP([12, 16])
    variables = mod.init(jax.random.PRNGKey(0), x, train=False)
    # force negative BN scales on some channels to exercise the min branch
    variables = jax.tree_util.tree_map(lambda v: v, variables)
    scale = variables["params"]["conv1"]["norm"]["scale"]
    flip = jnp.where(jnp.arange(scale.shape[0]) % 3 == 0, -1.0, 1.0)
    variables = jax.tree_util.tree_map(lambda v: v, variables)
    variables["params"]["conv1"]["norm"]["scale"] = scale * flip

    def ref(v):
        out, mut = mod.apply(
            v, x, mutable=["batch_stats"],
            method=lambda m, t: max_pool(m(t, train, 0.9), 2))
        return out, mut

    def pooled(v):
        out, mut = mod.apply(
            v, x, mutable=["batch_stats"],
            method=lambda m, t: m.call_pooled(t, train, 0.9, axis=2))
        return out, mut

    o0, m0 = ref(variables)
    o1, m1 = pooled(variables)
    np.testing.assert_allclose(o0, o1, atol=1e-5, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(m0),
                    jax.tree_util.tree_leaves(m1)):
        np.testing.assert_allclose(a, b, atol=1e-6, rtol=1e-6)

    if train:
        def loss(v, use_pooled):
            out, _ = (pooled if use_pooled else ref)(v)
            return jnp.sum(out ** 2)

        g0 = jax.grad(lambda v: loss(v, False))(variables)
        g1 = jax.grad(lambda v: loss(v, True))(variables)
        l0 = jax.tree_util.tree_leaves(g0)
        l1 = jax.tree_util.tree_leaves(g1)
        gscale = max(float(jnp.max(jnp.abs(a))) for a in l0) + 1e-6
        for a, b in zip(l0, l1):
            assert float(jnp.max(jnp.abs(a - b))) / gscale < 1e-5


@pytest.mark.parametrize("group_all", [False, True])
def test_sa_module_pooled_matches_explicit(rng, group_all):
    """The SA module's default max-pooling path (pooled tail) equals the
    explicit finish_first/__call__ + max_pool composition."""
    from pointnet2_tpu.nn.pointnet import _lifted_center_term
    from pointnet2_tpu.ops import (farthest_point_sample, gather_point,
                                   group_point, query_ball_point)
    from pointnet2_tpu.nn.pointnet import sample_and_group_all

    xyz = jnp.asarray(rng.rand(2, 128, 3).astype(np.float32))
    if group_all:
        mod = SetAbstraction(npoint=None, radius=None, nsample=None,
                             mlp=[8, 16], group_all=True)
    else:
        mod = SetAbstraction(npoint=32, radius=0.3, nsample=8, mlp=[8, 16])
    variables = mod.init(jax.random.PRNGKey(0), xyz, None, train=False)

    def explicit(m, x):
        if group_all:
            _, new_points, _, _ = sample_and_group_all(x, None, True)
            out = m.mlp_mod(new_points, True, 0.9)
            return max_pool(out, 2)
        new_xyz = gather_point(x, farthest_point_sample(x, m.npoint))
        idx, _ = query_ball_point(m.radius, m.nsample, x, new_xyz)
        grouped = group_point(m.mlp_mod.lift_first(x), idx)
        cw = _lifted_center_term(m.mlp_mod, new_xyz, 0, True, x.dtype)
        grouped = grouped - cw[:, :, None, :]
        out = m.mlp_mod.finish_first(grouped, True, 0.9)
        return max_pool(out, 2)

    p_ref, _ = mod.apply(variables, xyz, method=explicit,
                         mutable=["batch_stats"])
    (_, p_new, _), _ = mod.apply(variables, xyz, None, train=True,
                                 bn_momentum=0.9, mutable=["batch_stats"])
    np.testing.assert_allclose(p_ref, p_new, atol=1e-5, rtol=1e-5)


def test_msg_module_pooled_still_correct(rng):
    """MSG forward with the pooled tail stays finite and shape-correct for
    both the lifted and unlifted branches."""
    xyz = jnp.asarray(rng.rand(2, 128, 3).astype(np.float32))
    pts = jnp.asarray(rng.rand(2, 128, 6).astype(np.float32))
    for fuse in (True, False):
        mod = SetAbstractionMSG(npoint=32, radius_list=[0.2, 0.4],
                                nsample_list=[8, 16],
                                mlp_list=[[8, 16], [8, 16]],
                                fuse_first=fuse)
        variables = mod.init(jax.random.PRNGKey(0), xyz, pts, train=False)
        (nx, out), _ = mod.apply(variables, xyz, pts, train=True,
                                 bn_momentum=0.9, mutable=["batch_stats"])
        assert out.shape == (2, 32, 32)
        assert bool(jnp.all(jnp.isfinite(out)))
