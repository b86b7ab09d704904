"""max_pool: the precision-robust pooling op (ops/pooling.py).

Regression context: on TPU, jnp.max's eq-mask gradient collapses to ~0 when
the pooled value was downcast f32->bf16 inside the same fusion (see the
ops/pooling.py module docstring). These tests pin the index-routed VJP
semantics; the TPU failure itself is not reproducible on the CPU CI mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointnet2_tpu.ops import max_pool


def test_max_pool_forward_matches_jnp(rng):
    x = jnp.asarray(rng.randn(4, 7, 5).astype(np.float32))
    for axis in (0, 1, 2, -1):
        np.testing.assert_array_equal(
            np.asarray(max_pool(x, axis)), np.asarray(jnp.max(x, axis=axis)))


def test_max_pool_grad_routes_to_first_argmax():
    x = jnp.asarray([[1.0, 3.0, 3.0, 2.0],
                     [5.0, 4.0, 5.0, 5.0]])
    g = jax.grad(lambda x: jnp.sum(max_pool(x, 1) * jnp.asarray([2.0, 7.0])))(x)
    # full cotangent goes to the first max occurrence (lowest index)
    np.testing.assert_array_equal(
        np.asarray(g), np.asarray([[0.0, 2.0, 0.0, 0.0],
                                   [7.0, 0.0, 0.0, 0.0]]))


def test_max_pool_grad_matches_jnp_when_unique(rng):
    # with distinct entries the index-routed grad equals the eq-mask grad
    x = jnp.asarray(rng.randn(3, 9, 4).astype(np.float32))
    g1 = jax.grad(lambda x: jnp.sum(jnp.sin(max_pool(x, 1))))(x)
    g2 = jax.grad(lambda x: jnp.sum(jnp.sin(jnp.max(x, axis=1))))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-6)


@pytest.mark.parametrize("dt", [jnp.float32, jnp.bfloat16])
def test_max_pool_grad_survives_downcast(rng, dt):
    """grad through (f32 arithmetic -> cast dt -> max) must not vanish —
    the TPU mixed-precision failure mode this op exists to prevent."""
    x = jnp.asarray(rng.randn(8, 16, 32).astype(np.float32))

    def f(x):
        y = ((x.astype(jnp.float32) - 0.1) * 1.7).astype(dt)
        return jnp.sum(max_pool(y, 1).astype(jnp.float32))

    g = np.asarray(jax.jit(jax.grad(f))(x))
    # every window routes exactly 1.7 of cotangent to one element
    assert np.isfinite(g).all()
    np.testing.assert_allclose(np.abs(g).sum(), 1.7 * 8 * 32, rtol=0.05)
