import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointnet2_tpu.ops import group_point, knn_point, query_ball_point
from tests import golden


@pytest.mark.parametrize("impl", ["xla", "pallas"])
@pytest.mark.parametrize(
    "B,N,M,radius,nsample",
    [(2, 128, 32, 0.4, 16), (3, 100, 17, 0.2, 8), (2, 256, 64, 0.1, 32)],
)
def test_ball_query_matches_golden(rng, impl, B, N, M, radius, nsample):
    xyz1 = rng.rand(B, N, 3).astype(np.float32)
    qidx = rng.randint(0, N, (B, M))
    xyz2 = np.stack([xyz1[b][qidx[b]] for b in range(B)])
    idx, cnt = query_ball_point(radius, nsample, jnp.asarray(xyz1),
                                jnp.asarray(xyz2), impl=impl)
    widx, wcnt = golden.ball_query_np(radius, nsample, xyz1, xyz2)
    np.testing.assert_array_equal(np.asarray(cnt), wcnt)
    np.testing.assert_array_equal(np.asarray(idx), widx)


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_ball_query_pad_with_first_hit(impl):
    # one dataset point inside the ball => all slots point at it
    xyz1 = jnp.asarray([[[0.0, 0, 0], [5.0, 5, 5], [0.01, 0, 0]]])
    xyz2 = jnp.asarray([[[0.0, 0, 0]]])
    idx, cnt = query_ball_point(0.1, 4, xyz1, xyz2, impl=impl)
    # hits 0 and 2 in scan order; remaining slots padded with first hit (0)
    np.testing.assert_array_equal(np.asarray(idx), [[[0, 2, 0, 0]]])
    np.testing.assert_array_equal(np.asarray(cnt), [[2]])


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_ball_query_empty_ball(impl):
    xyz1 = jnp.asarray([[[5.0, 5, 5], [6.0, 6, 6]]])
    xyz2 = jnp.asarray([[[0.0, 0, 0]]])
    idx, cnt = query_ball_point(0.1, 3, xyz1, xyz2, impl=impl)
    np.testing.assert_array_equal(np.asarray(cnt), [[0]])
    np.testing.assert_array_equal(np.asarray(idx), [[[0, 0, 0]]])


def test_group_point_forward(rng):
    pts = rng.randn(2, 16, 5).astype(np.float32)
    idx = rng.randint(0, 16, (2, 4, 3)).astype(np.int32)
    got = np.asarray(group_point(jnp.asarray(pts), jnp.asarray(idx)))
    assert got.shape == (2, 4, 3, 5)
    for b in range(2):
        np.testing.assert_allclose(got[b], pts[b][idx[b]])


def test_group_point_grad_scatter_add(rng):
    pts = rng.randn(1, 6, 2).astype(np.float32)
    idx = np.array([[[0, 0, 2], [2, 5, 5]]], np.int32)

    def f(p):
        return jnp.sum(group_point(p, jnp.asarray(idx)))

    g = np.asarray(jax.grad(f)(jnp.asarray(pts)))
    want = np.zeros_like(pts)
    counts = {0: 2, 2: 2, 5: 2}
    for k, v in counts.items():
        want[0, k] = v
    np.testing.assert_allclose(g, want)


def test_group_point_numeric_gradient(rng):
    """Numeric-vs-analytic gradient check through ball-query indices
    (mirrors the reference's tf_grouping_op_test.py:9-25)."""
    xyz1 = rng.rand(1, 32, 3).astype(np.float32)
    xyz2 = xyz1[:, :8]
    idx, _ = query_ball_point(0.3, 4, jnp.asarray(xyz1), jnp.asarray(xyz2),
                              impl="xla")
    pts = rng.randn(1, 32, 6).astype(np.float32)

    def f(p):
        return jnp.sum(jnp.sin(group_point(p, idx)))

    g = np.asarray(jax.grad(f)(jnp.asarray(pts)))
    eps = 1e-3
    for _ in range(10):
        i, j = rng.randint(0, 32), rng.randint(0, 6)
        p1, p2 = pts.copy(), pts.copy()
        p1[0, i, j] += eps
        p2[0, i, j] -= eps
        num = (f(jnp.asarray(p1)) - f(jnp.asarray(p2))) / (2 * eps)
        np.testing.assert_allclose(g[0, i, j], num, atol=1e-2)


def test_knn_matches_golden(rng):
    xyz1 = rng.rand(2, 64, 3).astype(np.float32)
    xyz2 = rng.rand(2, 16, 3).astype(np.float32)
    val, idx = knn_point(8, jnp.asarray(xyz1), jnp.asarray(xyz2))
    wval, widx = golden.knn_np(8, xyz1, xyz2)
    np.testing.assert_array_equal(np.asarray(idx), widx)
    np.testing.assert_allclose(np.asarray(val), wval, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("B,N,M,S,C", [(2, 64, 16, 8, 32), (1, 100, 7, 3, 5)])
def test_group_point_pallas_matches_xla(rng, B, N, M, S, C):
    from pointnet2_tpu.ops.pallas.group import group_point_pallas

    pts = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, N, (B, M, S)).astype(np.int32))
    got = np.asarray(group_point_pallas(pts, idx))
    want = np.asarray(group_point(pts, idx, impl="xla"))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_group_point_pallas_grad_matches_xla(rng):
    from pointnet2_tpu.ops.pallas.group import group_point_pallas

    pts = jnp.asarray(rng.randn(2, 64, 16).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 64, (2, 10, 4)).astype(np.int32))
    cot = jnp.asarray(rng.randn(2, 10, 4, 16).astype(np.float32))

    def loss_p(p):
        return jnp.vdot(group_point_pallas(p, idx), cot)

    def loss_x(p):
        return jnp.vdot(group_point(p, idx, impl="xla"), cot)

    gp = np.asarray(jax.grad(loss_p)(pts))
    gx = np.asarray(jax.grad(loss_x)(pts))
    np.testing.assert_allclose(gp, gx, rtol=1e-5, atol=1e-5)


def test_gather_point_pallas_matches_xla(rng):
    from pointnet2_tpu.ops.pallas.group import gather_point_pallas
    from pointnet2_tpu.ops import gather_point

    pts = jnp.asarray(rng.randn(2, 50, 3).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 50, (2, 20)).astype(np.int32))
    got = np.asarray(gather_point_pallas(pts, idx))
    want = np.asarray(gather_point(pts, idx, impl="xla"))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    cot = jnp.asarray(rng.randn(2, 20, 3).astype(np.float32))
    gp = np.asarray(jax.grad(lambda p: jnp.vdot(gather_point_pallas(p, idx), cot))(pts))
    gx = np.asarray(jax.grad(lambda p: jnp.vdot(gather_point(p, idx, impl="xla"), cot))(pts))
    np.testing.assert_allclose(gp, gx, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("B,N,M,S,C", [(2, 64, 16, 8, 32), (1, 100, 7, 3, 5)])
def test_group_point_mxu_exact(rng, dtype, B, N, M, S, C):
    """The one-hot einsum gather (TPU default) is value-exact, both dtypes."""
    pts = jnp.asarray(rng.randn(B, N, C).astype(np.float32)).astype(dtype)
    idx = jnp.asarray(rng.randint(0, N, (B, M, S)).astype(np.int32))
    got = np.asarray(group_point(pts, idx, impl="mxu"))
    want = np.asarray(group_point(pts, idx, impl="xla"))
    np.testing.assert_array_equal(got, want)


def test_group_point_mxu_grad_matches_xla(rng):
    pts = jnp.asarray(rng.randn(2, 64, 16).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 64, (2, 10, 4)).astype(np.int32))
    cot = jnp.asarray(rng.randn(2, 10, 4, 16).astype(np.float32))
    gm = np.asarray(jax.grad(
        lambda p: jnp.vdot(group_point(p, idx, impl="mxu"), cot))(pts))
    gx = np.asarray(jax.grad(
        lambda p: jnp.vdot(group_point(p, idx, impl="xla"), cot))(pts))
    np.testing.assert_allclose(gm, gx, rtol=1e-5, atol=1e-5)


def test_gather_point_mxu_exact_and_grad(rng):
    from pointnet2_tpu.ops import gather_point

    pts = jnp.asarray(rng.randn(2, 50, 3).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 50, (2, 20)).astype(np.int32))
    np.testing.assert_array_equal(
        np.asarray(gather_point(pts, idx, impl="mxu")),
        np.asarray(gather_point(pts, idx, impl="xla")))
    cot = jnp.asarray(rng.randn(2, 20, 3).astype(np.float32))
    gm = np.asarray(jax.grad(
        lambda p: jnp.vdot(gather_point(p, idx, impl="mxu"), cot))(pts))
    gx = np.asarray(jax.grad(
        lambda p: jnp.vdot(gather_point(p, idx, impl="xla"), cot))(pts))
    np.testing.assert_allclose(gm, gx, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize(
    "B,N,M,radius,nsample",
    [
        (1, 2048, 16, 0.15, 16),  # multi-chunk MXU cumsum (N % 1024 == 0)
        (1, 1300, 16, 0.15, 16),  # Np=1408 > chunk, not divisible: VPU cumsum
    ],
)
def test_ball_query_large_n_cumsum_paths(rng, B, N, M, radius, nsample):
    """The two in-kernel cumsum strategies agree with the golden scan."""
    xyz1 = rng.rand(B, N, 3).astype(np.float32)
    qidx = rng.randint(0, N, (B, M))
    xyz2 = np.stack([xyz1[b][qidx[b]] for b in range(B)])
    idx, cnt = query_ball_point(radius, nsample, jnp.asarray(xyz1),
                                jnp.asarray(xyz2), impl="pallas")
    widx, wcnt = golden.ball_query_np(radius, nsample, xyz1, xyz2)
    np.testing.assert_array_equal(np.asarray(cnt), wcnt)
    np.testing.assert_array_equal(np.asarray(idx), widx)


@pytest.mark.parametrize("impl", ["xla", "pallas"])
@pytest.mark.parametrize("B,N,M,radius,nsample",
                         [(2, 128, 32, 0.4, 16), (3, 100, 17, 0.2, 8)])
def test_query_ball_and_group_xyz_matches_unfused(rng, impl, B, N, M, radius,
                                                  nsample):
    from pointnet2_tpu.ops import query_ball_and_group_xyz

    xyz1 = jnp.asarray(rng.rand(B, N, 3).astype(np.float32))
    xyz2 = jnp.asarray(rng.rand(B, M, 3).astype(np.float32))
    idx, cnt, grouped = query_ball_and_group_xyz(radius, nsample, xyz1, xyz2,
                                                 impl=impl)
    widx, wcnt = query_ball_point(radius, nsample, xyz1, xyz2, impl="xla")
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(widx))
    np.testing.assert_array_equal(np.asarray(cnt), np.asarray(wcnt))
    np.testing.assert_array_equal(
        np.asarray(grouped), np.asarray(group_point(xyz1, widx, impl="xla")))


def test_query_ball_and_group_xyz_empty_ball_pads_point0(rng):
    """Empty balls pad idx with 0 AND coords with point 0 (both impls)."""
    from pointnet2_tpu.ops import query_ball_and_group_xyz

    xyz1 = jnp.asarray([[[5.0, 6, 7], [8.0, 9, 10]]])
    xyz2 = jnp.asarray([[[0.0, 0, 0]]])
    for impl in ("xla", "pallas"):
        idx, cnt, grouped = query_ball_and_group_xyz(0.1, 3, xyz1, xyz2,
                                                     impl=impl)
        np.testing.assert_array_equal(np.asarray(cnt), [[0]])
        np.testing.assert_array_equal(np.asarray(idx), [[[0, 0, 0]]])
        np.testing.assert_array_equal(
            np.asarray(grouped), np.broadcast_to([5.0, 6, 7], (1, 1, 3, 3)))


def test_query_ball_and_group_xyz_grad_is_scatter_add(rng):
    from pointnet2_tpu.ops import query_ball_and_group_xyz

    xyz1 = jnp.asarray(rng.rand(2, 48, 3).astype(np.float32))
    xyz2 = jnp.asarray(rng.rand(2, 9, 3).astype(np.float32))
    cot = jnp.asarray(rng.randn(2, 9, 5, 3).astype(np.float32))

    def loss(impl):
        def f(p):
            _, _, grouped = query_ball_and_group_xyz(0.4, 5, p, xyz2,
                                                     impl=impl)
            return jnp.vdot(grouped, cot)
        return f

    gp = np.asarray(jax.grad(loss("pallas"))(xyz1))
    gx = np.asarray(jax.grad(loss("xla"))(xyz1))
    np.testing.assert_allclose(gp, gx, rtol=1e-5, atol=1e-5)


def test_impl_dispatch_not_pinned_by_jit_cache(rng):
    """config.default_impl must take effect on every eager call — a jitted
    dispatcher would pin the first-resolved implementation in its trace
    cache (regression test)."""
    from unittest import mock

    from pointnet2_tpu import config as cfg
    from pointnet2_tpu.ops import grouping

    xyz = jnp.asarray(rng.rand(2, 64, 3).astype(np.float32))
    new_xyz = xyz[:, :16]
    with cfg.default_impl("xla"):
        query_ball_point(0.3, 8, xyz, new_xyz)  # populate any caches
    calls = []
    real = cfg.resolve_impl

    def spy(impl):
        out = real(impl)
        calls.append(out)
        return out

    with mock.patch.object(grouping.config, "resolve_impl", spy):
        with cfg.default_impl("xla"):
            query_ball_point(0.3, 8, xyz, new_xyz)
        with cfg.default_impl("pallas"):
            query_ball_point(0.3, 8, xyz, new_xyz)
    assert calls == ["xla", "pallas"]


def test_integer_gather_exact_above_2_24(rng):
    """Integer payloads must bypass the f32-accumulating one-hot paths
    (which corrupt values above 2^24) under every impl setting."""
    from pointnet2_tpu import config as cfg
    from pointnet2_tpu.ops import gather_point

    vals = (np.int32(1) << 24) + rng.randint(0, 1 << 22, (2, 32, 4))
    points = jnp.asarray(vals.astype(np.int32))
    idx = jnp.asarray(rng.randint(0, 32, (2, 8)).astype(np.int32))
    want = np.take_along_axis(vals, np.asarray(idx)[:, :, None], axis=1)
    for impl in ("xla", "mxu", "pallas"):
        with cfg.default_impl(impl):
            got = gather_point(points, idx)
        np.testing.assert_array_equal(np.asarray(got), want, err_msg=impl)


def test_ball_query_impl_parity_at_radius_boundary():
    """A point at exactly the f32-rounded radius boundary must be counted
    identically by the XLA and Pallas implementations (regression: the
    Pallas kernel used the python-f64 radius**2, one ulp off f32)."""
    from pointnet2_tpu import config as cfg

    r = 0.1
    d = float(np.sqrt(np.float32(np.float32(r) ** 2)))  # d2 == f32(r)^2
    xyz = jnp.asarray(np.array([[[0.0, 0.0, 0.0], [d, 0.0, 0.0],
                                 [0.05, 0.0, 0.0], [0.5, 0.5, 0.5]]],
                               np.float32))
    q = xyz[:, :1]
    outs = {}
    for impl in ("xla", "pallas"):
        with cfg.default_impl(impl):
            idx, cnt = query_ball_point(r, 3, xyz, q)
        outs[impl] = (np.asarray(idx), np.asarray(cnt))
    np.testing.assert_array_equal(outs["xla"][0], outs["pallas"][0])
    np.testing.assert_array_equal(outs["xla"][1], outs["pallas"][1])


@pytest.mark.parametrize("impl", ["xla", "pallas"])
@pytest.mark.parametrize(
    "B,N,M,radii,nsamples",
    [
        (2, 128, 32, (0.1, 0.2, 0.4), (8, 16, 32)),
        (3, 100, 17, (0.2, 0.4, 0.8), (16, 16, 8)),   # unpadded N, mixed ns
        (1, 2048, 16, (0.1, 0.4), (16, 64)),          # multi-chunk MXU path
    ],
)
def test_multi_radius_ball_query_matches_independent(rng, impl, B, N, M,
                                                     radii, nsamples):
    """query_ball_point_multi must be bit-identical to one query_ball_point
    call per radius (the MSG stacks swap the per-radius loop for the fused
    distance-tile pass on the strength of this equivalence)."""
    from pointnet2_tpu.ops import query_ball_point_multi

    xyz1 = rng.rand(B, N, 3).astype(np.float32)
    qidx = rng.randint(0, N, (B, M))
    xyz2 = np.stack([xyz1[b][qidx[b]] for b in range(B)])
    outs = query_ball_point_multi(radii, nsamples, jnp.asarray(xyz1),
                                  jnp.asarray(xyz2), impl=impl)
    assert len(outs) == len(radii)
    for (idx, cnt), r, ns in zip(outs, radii, nsamples):
        widx, wcnt = query_ball_point(r, ns, jnp.asarray(xyz1),
                                      jnp.asarray(xyz2), impl=impl)
        np.testing.assert_array_equal(np.asarray(cnt), np.asarray(wcnt))
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(widx))
        gidx, gcnt = golden.ball_query_np(r, ns, xyz1, xyz2)
        np.testing.assert_array_equal(np.asarray(cnt), gcnt)
        np.testing.assert_array_equal(np.asarray(idx), gidx)
