"""Tests for area-weighted mesh sampling (ops/mesh.py).

Covers the capability demoed in the reference's
tf_ops/sampling/tf_sampling.py:60-89 __main__ block: area-proportional
triangle selection, uniform barycentric draws, and FPS reduction.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pointnet2_tpu.ops import sample_mesh, triangle_areas
from pointnet2_tpu.ops.mesh import sample_mesh as sample_mesh_direct


def _right_triangles():
    # Two disjoint right triangles in z=0 and z=1 planes, areas 0.5 and 4.5.
    t0 = [[0, 0, 0], [1, 0, 0], [0, 1, 0]]
    t1 = [[0, 0, 1], [3, 0, 1], [0, 3, 1]]
    return np.array([[t0, t1]], np.float32)  # (1, 2, 3, 3)


def test_triangle_areas():
    tris = _right_triangles()
    areas = np.asarray(triangle_areas(jnp.asarray(tris)))
    # triangle_areas returns |cross| = 2 * area (constant cancels in the
    # categorical draw).
    np.testing.assert_allclose(areas, [[1.0, 9.0]], rtol=1e-5)


def test_samples_lie_on_surface():
    tris = _right_triangles()
    pts = np.asarray(sample_mesh(jnp.asarray(tris), 512, jax.random.PRNGKey(0)))
    assert pts.shape == (1, 512, 3)
    z = pts[0, :, 2]
    on0 = np.isclose(z, 0.0)
    on1 = np.isclose(z, 1.0)
    assert np.all(on0 | on1)
    # Inside each triangle: x, y >= 0 and x + y <= legs.
    x, y = pts[0, :, 0], pts[0, :, 1]
    assert np.all(x >= -1e-6) and np.all(y >= -1e-6)
    assert np.all(x[on0] + y[on0] <= 1 + 1e-5)
    assert np.all(x[on1] + y[on1] <= 3 + 1e-5)


def test_area_proportional_selection():
    tris = _right_triangles()
    pts = np.asarray(
        sample_mesh(jnp.asarray(tris), 4096, jax.random.PRNGKey(1)))
    frac_big = np.mean(np.isclose(pts[0, :, 2], 1.0))
    # Big triangle has 9x the area -> expect ~0.9 of the draws.
    assert 0.85 < frac_big < 0.95


def test_fps_reduction_and_jit():
    tris = _right_triangles()
    fn = jax.jit(lambda t, k: sample_mesh_direct(t, 1024, k, npoint=128))
    reduced = np.asarray(fn(jnp.asarray(tris), jax.random.PRNGKey(2)))
    assert reduced.shape == (1, 128, 3)
    # FPS keeps points from both triangles (both planes represented).
    z = reduced[0, :, 2]
    assert np.any(np.isclose(z, 0.0)) and np.any(np.isclose(z, 1.0))


def test_batched_meshes_independent():
    tris = np.concatenate([_right_triangles(), _right_triangles() + 10.0], 0)
    pts = np.asarray(
        sample_mesh(jnp.asarray(tris), 256, jax.random.PRNGKey(3)))
    assert pts.shape == (2, 256, 3)
    assert np.all(pts[0] < 5.0) and np.all(pts[1] > 5.0)
