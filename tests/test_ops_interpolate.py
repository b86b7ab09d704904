import jax
import jax.numpy as jnp
import numpy as np

from pointnet2_tpu.ops import three_interpolate, three_nn
from tests import golden


def test_three_nn_matches_golden(rng):
    xyz1 = rng.rand(2, 64, 3).astype(np.float32)
    xyz2 = rng.rand(2, 16, 3).astype(np.float32)
    dist, idx = three_nn(jnp.asarray(xyz1), jnp.asarray(xyz2))
    wdist, widx = golden.three_nn_np(xyz1, xyz2)
    np.testing.assert_array_equal(np.asarray(idx), widx)
    np.testing.assert_allclose(np.asarray(dist), wdist, rtol=1e-5, atol=1e-6)


def test_three_nn_returns_squared_distances():
    xyz1 = jnp.asarray([[[0.0, 0, 0]]])
    xyz2 = jnp.asarray([[[2.0, 0, 0], [0, 3.0, 0], [0, 0, 6.0]]])
    dist, idx = three_nn(xyz1, xyz2)
    np.testing.assert_allclose(np.asarray(dist), [[[4.0, 9.0, 36.0]]])
    np.testing.assert_array_equal(np.asarray(idx), [[[0, 1, 2]]])


def test_three_interpolate_forward(rng):
    pts = rng.randn(2, 8, 4).astype(np.float32)
    idx = rng.randint(0, 8, (2, 6, 3)).astype(np.int32)
    w = rng.rand(2, 6, 3).astype(np.float32)
    got = np.asarray(three_interpolate(jnp.asarray(pts), jnp.asarray(idx),
                                       jnp.asarray(w)))
    want = np.zeros((2, 6, 4), np.float32)
    for b in range(2):
        for j in range(6):
            for i in range(3):
                want[b, j] += pts[b, idx[b, j, i]] * w[b, j, i]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_three_interpolate_numeric_gradient(rng):
    """Mirrors the reference's tf_interpolate_op_test.py:9-21."""
    pts = rng.randn(1, 8, 4).astype(np.float32)
    idx = rng.randint(0, 8, (1, 16, 3)).astype(np.int32)
    w = rng.rand(1, 16, 3).astype(np.float32)

    def f(p):
        return jnp.sum(jnp.tanh(three_interpolate(p, jnp.asarray(idx),
                                                  jnp.asarray(w))))

    g = np.asarray(jax.grad(f)(jnp.asarray(pts)))
    eps = 1e-3
    for _ in range(10):
        i, j = rng.randint(0, 8), rng.randint(0, 4)
        p1, p2 = pts.copy(), pts.copy()
        p1[0, i, j] += eps
        p2[0, i, j] -= eps
        num = (f(jnp.asarray(p1)) - f(jnp.asarray(p2))) / (2 * eps)
        np.testing.assert_allclose(g[0, i, j], num, atol=1e-2)


def test_three_interpolate_weight_gradient(rng):
    pts = rng.randn(1, 8, 4).astype(np.float32)
    idx = rng.randint(0, 8, (1, 6, 3)).astype(np.int32)
    w = rng.rand(1, 6, 3).astype(np.float32)

    def f(wt):
        return jnp.sum(three_interpolate(jnp.asarray(pts), jnp.asarray(idx), wt) ** 2)

    g = np.asarray(jax.grad(f)(jnp.asarray(w)))
    eps = 1e-3
    for _ in range(5):
        i, j = rng.randint(0, 6), rng.randint(0, 3)
        w1, w2 = w.copy(), w.copy()
        w1[0, i, j] += eps
        w2[0, i, j] -= eps
        num = (f(jnp.asarray(w1)) - f(jnp.asarray(w2))) / (2 * eps)
        np.testing.assert_allclose(g[0, i, j], num, atol=1e-2)


def test_three_nn_fewer_than_three_known_points():
    """Missing slots get dist=inf, idx=0 (tf_interpolate.cpp:66-67)."""
    xyz1 = jnp.asarray([[[0.0, 0, 0], [1.0, 0, 0]]])
    xyz2 = jnp.asarray([[[0.5, 0, 0]]])  # single known point
    dist, idx = three_nn(xyz1, xyz2)
    np.testing.assert_array_equal(np.asarray(idx), [[[0, 0, 0], [0, 0, 0]]])
    d = np.asarray(dist)
    np.testing.assert_allclose(d[:, :, 0], [[0.25, 0.25]])
    assert np.isinf(d[:, :, 1:]).all()


def test_three_interpolate_mxu_matches_xla(rng):
    """The one-hot MXU formulation (fwd + both grads) against the
    take_along_axis/scatter semantic reference."""
    pts = rng.randn(2, 16, 8).astype(np.float32)
    idx = rng.randint(0, 16, (2, 24, 3)).astype(np.int32)
    w = rng.rand(2, 24, 3).astype(np.float32)
    w /= w.sum(-1, keepdims=True)
    args = (jnp.asarray(pts), jnp.asarray(idx), jnp.asarray(w))

    def run(impl):
        out = three_interpolate(*args, impl=impl)

        def loss(p, wt):
            return jnp.sum(three_interpolate(p, args[1], wt, impl=impl) ** 2)

        gp, gw = jax.grad(loss, argnums=(0, 1))(args[0], args[2])
        return out, gp, gw

    for a, b in zip(run("mxu"), run("xla")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_three_interpolate_mxu_duplicate_indices(rng):
    """M < 3 padding repeats index 0; duplicate neighbors must accumulate."""
    pts = rng.randn(1, 4, 5).astype(np.float32)
    idx = np.array([[[2, 2, 0], [0, 0, 0]]], np.int32)
    w = np.array([[[0.5, 0.25, 0.25], [1.0, 0.0, 0.0]]], np.float32)
    a = three_interpolate(jnp.asarray(pts), jnp.asarray(idx), jnp.asarray(w),
                          impl="mxu")
    b = three_interpolate(jnp.asarray(pts), jnp.asarray(idx), jnp.asarray(w),
                          impl="xla")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_three_nn_pallas_matches_golden(rng):
    xyz1 = rng.rand(2, 70, 3).astype(np.float32)
    xyz2 = rng.rand(2, 33, 3).astype(np.float32)
    dist, idx = three_nn(jnp.asarray(xyz1), jnp.asarray(xyz2), impl="pallas")
    wdist, widx = golden.three_nn_np(xyz1, xyz2)
    np.testing.assert_array_equal(np.asarray(idx), widx)
    np.testing.assert_allclose(np.asarray(dist), wdist, rtol=1e-5, atol=1e-6)


def test_three_nn_pallas_duplicate_distances(rng):
    """Equidistant known points must fill distinct slots (lowest index
    first), exactly like the reference's insertion update."""
    xyz1 = np.zeros((1, 4, 3), np.float32)
    xyz2 = np.array([[[1.0, 0, 0], [0, 1.0, 0], [-1.0, 0, 0],
                      [0, 0, 0.5]]], np.float32)
    for impl in ("xla", "pallas"):
        dist, idx = three_nn(jnp.asarray(xyz1), jnp.asarray(xyz2), impl=impl)
        np.testing.assert_array_equal(np.asarray(idx)[0, 0], [3, 0, 1])
        np.testing.assert_allclose(np.asarray(dist)[0, 0], [0.25, 1.0, 1.0])


def test_three_nn_pallas_fewer_than_three_known(rng):
    """M < 3: missing slots at dist=inf / idx=0 on both paths."""
    xyz1 = rng.rand(1, 9, 3).astype(np.float32)
    xyz2 = rng.rand(1, 2, 3).astype(np.float32)
    dx, ix = three_nn(jnp.asarray(xyz1), jnp.asarray(xyz2), impl="xla")
    dp, ip = three_nn(jnp.asarray(xyz1), jnp.asarray(xyz2), impl="pallas")
    np.testing.assert_array_equal(np.asarray(ix), np.asarray(ip))
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dp))
    assert np.all(np.isinf(np.asarray(dp)[..., 2]))
    assert np.all(np.asarray(ip)[..., 2] == 0)


def test_three_nn_pallas_large_m_falls_back(rng):
    """M beyond the kernel's VMEM tile budget routes to the XLA path
    (the Pallas kernel tiles only N; its (TN, M) working tiles grow
    linearly in M). Correctness must be impl-invariant either way."""
    from pointnet2_tpu.ops.interpolate import _PALLAS_MAX_M

    xyz1 = rng.rand(1, 5, 3).astype(np.float32)
    xyz2 = rng.rand(1, _PALLAS_MAX_M + 1, 3).astype(np.float32)
    dist, idx = three_nn(jnp.asarray(xyz1), jnp.asarray(xyz2), impl="pallas")
    wdist, widx = golden.three_nn_np(xyz1, xyz2)
    np.testing.assert_array_equal(np.asarray(idx), widx)
    np.testing.assert_allclose(np.asarray(dist), wdist, rtol=1e-5, atol=1e-6)
