"""Area-weighted mesh -> point-cloud sampling (TPU-native, fully jittable).

Capability parity with the reference's mesh-sampling demo
(tf_ops/sampling/tf_sampling.py:60-89): pick triangles with probability
proportional to their area (prob_sample), draw a uniform barycentric point
on each, then optionally reduce to a uniform blue-noise-ish subset with
farthest-point sampling. The reference stitches this together ad hoc in a
__main__ block with TF session plumbing; here it is a first-class jittable
function usable under jit/vmap/grad-stop (indices are integer, so the
sampling itself is non-differentiable by construction, matching the
reference's NoGradient ops).

Everything is static-shaped and batched, so XLA fuses the whole path into
a handful of kernels: one cumsum + searchsorted for the categorical draw,
one gather, and elementwise barycentric math.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pointnet2_tpu.ops.sampling import (
    farthest_point_sample,
    gather_point,
    prob_sample,
)

__all__ = ["triangle_areas", "sample_mesh"]


def triangle_areas(triangles: jax.Array) -> jax.Array:
    """Twice-area weights for each triangle (the norm of the cross product;
    the constant 1/2 cancels in the categorical normalization, as in the
    reference which also uses |cross| directly).

    triangles: (B, T, 3, 3) float — corners [a, b, c] in the last-but-one
    axis. Returns (B, T) float32 with a 1e-9 floor under the sqrt so
    degenerate triangles keep a finite (tiny) weight, matching
    tf_sampling.py:68.
    """
    a = triangles[:, :, 0, :]
    b = triangles[:, :, 1, :]
    c = triangles[:, :, 2, :]
    cross = jnp.cross(b - a, c - a)
    return jnp.sqrt(jnp.sum(cross.astype(jnp.float32) ** 2, axis=-1) + 1e-9)


def sample_mesh(triangles: jax.Array, n_samples: int, key: jax.Array,
                npoint: int | None = None) -> jax.Array:
    """Sample a point cloud uniformly over a triangle mesh's surface.

    triangles: (B, T, 3, 3) float corners; n_samples: surface draws per
    mesh; key: PRNG key; npoint: if given, reduce the n_samples draws to
    npoint uniformly-spread points via farthest_point_sample (the
    reference's oversample-then-FPS recipe, tf_sampling.py:83).

    Returns (B, npoint or n_samples, 3) points on the surface.

    The barycentric draw folds (u, v) with u + v > 1 back into the lower
    triangle via the reflect-about-the-diagonal identity
    (u, v) -> ((u' + d)/2, (u' - d)/2) with u' = 1 - |u + v - 1|,
    d = u - v — uniform over the triangle without branching
    (tf_sampling.py:75-79).
    """
    B, T = triangles.shape[:2]
    k_tri, k_u, k_v = jax.random.split(key, 3)
    areas = triangle_areas(triangles)  # (B, T)
    r = jax.random.uniform(k_tri, (B, n_samples), jnp.float32)
    tri_idx = prob_sample(areas, r)  # (B, S)

    corners = triangles.reshape(B, T, 9)
    picked = gather_point(corners, tri_idx).reshape(B, n_samples, 3, 3)
    a, b, c = picked[:, :, 0], picked[:, :, 1], picked[:, :, 2]

    us = jax.random.uniform(k_u, (B, n_samples), triangles.dtype)
    vs = jax.random.uniform(k_v, (B, n_samples), triangles.dtype)
    uplusv = 1.0 - jnp.abs(us + vs - 1.0)
    uminusv = us - vs
    us = (uplusv + uminusv) * 0.5
    vs = (uplusv - uminusv) * 0.5
    pts = a + (b - a) * us[..., None] + (c - a) * vs[..., None]

    if npoint is not None:
        pts = gather_point(pts, farthest_point_sample(pts, npoint))
    return pts
