import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointnet2_tpu.ops import farthest_point_sample, gather_point, prob_sample
from tests import golden


@pytest.mark.parametrize("impl", ["xla", "pallas"])
@pytest.mark.parametrize("B,N,npoint", [(2, 64, 16), (4, 128, 32), (3, 100, 7)])
def test_fps_matches_golden(rng, impl, B, N, npoint):
    xyz = rng.randn(B, N, 3).astype(np.float32)
    got = np.asarray(farthest_point_sample(jnp.asarray(xyz), npoint, impl=impl))
    want = golden.fps_np(xyz, npoint)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_fps_seed_is_zero(rng, impl):
    xyz = rng.randn(2, 32, 3).astype(np.float32)
    got = np.asarray(farthest_point_sample(jnp.asarray(xyz), 8, impl=impl))
    assert (got[:, 0] == 0).all()


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_fps_selects_distinct_points(rng, impl):
    xyz = rng.randn(2, 64, 3).astype(np.float32)
    got = np.asarray(farthest_point_sample(jnp.asarray(xyz), 32, impl=impl))
    for b in range(2):
        assert len(set(got[b].tolist())) == 32


def test_fps_degenerate_identical_points():
    xyz = jnp.zeros((1, 16, 3), jnp.float32)
    got = np.asarray(farthest_point_sample(xyz, 4, impl="xla"))
    # all distances zero: argmax tie-break selects index 0 repeatedly
    np.testing.assert_array_equal(got, np.zeros((1, 4), np.int32))


def test_gather_point_forward(rng):
    pts = rng.randn(2, 16, 3).astype(np.float32)
    idx = rng.randint(0, 16, (2, 5)).astype(np.int32)
    got = np.asarray(gather_point(jnp.asarray(pts), jnp.asarray(idx)))
    want = np.stack([pts[b][idx[b]] for b in range(2)])
    np.testing.assert_allclose(got, want)


def test_gather_point_grad_is_scatter_add(rng):
    pts = rng.randn(1, 8, 3).astype(np.float32)
    idx = np.array([[1, 1, 3]], np.int32)  # duplicate index => grads accumulate

    def f(p):
        return jnp.sum(gather_point(p, jnp.asarray(idx)) * 2.0)

    g = np.asarray(jax.grad(f)(jnp.asarray(pts)))
    want = np.zeros_like(pts)
    want[0, 1] = 4.0  # two gathers of row 1
    want[0, 3] = 2.0
    np.testing.assert_allclose(g, want)


def test_prob_sample_statistics(rng):
    # weights heavily skewed to index 2 -> most samples should be 2
    w = np.array([[0.01, 0.01, 10.0, 0.01]], np.float32)
    r = rng.rand(1, 1000).astype(np.float32)
    s = np.asarray(prob_sample(jnp.asarray(w), jnp.asarray(r)))
    assert s.shape == (1, 1000)
    assert (s == 2).mean() > 0.95
    assert s.min() >= 0 and s.max() <= 3


def test_prob_sample_binary_search_bounds():
    w = jnp.asarray([[1.0, 1.0, 1.0, 1.0]])
    r = jnp.asarray([[0.0, 0.2499, 0.25, 0.9999]])
    s = np.asarray(prob_sample(w, r))
    # q = r*4; smallest index with cumsum >= q
    np.testing.assert_array_equal(s, [[0, 0, 0, 3]])


@pytest.mark.parametrize("B,N,npoint", [(5, 200, 24), (1, 1300, 48)])
def test_fps_batch_tile_edges(rng, B, N, npoint):
    """Odd batch sizes / lane-padded N exercise the kernel's tile picking."""
    xyz = rng.randn(B, N, 3).astype(np.float32)
    got = np.asarray(farthest_point_sample(jnp.asarray(xyz), npoint,
                                           impl="pallas"))
    want = golden.fps_np(xyz, npoint)
    np.testing.assert_array_equal(got, want)
