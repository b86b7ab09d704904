"""Golden tests for the augmentation family (reference: utils/provider.py).

Checks the geometric invariants the reference transforms guarantee —
rotation preserves norms and rotates normals with the same matrix
(provider.py:72-90), jitter/shift/scale bounds (provider.py:162-225),
point-dropout replace-with-first semantics (provider.py:227-234) — for both
the vectorized host (data.augment) and on-device (data.augment_jax) paths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointnet2_tpu.data import augment, augment_jax


def _batch(rng, B=4, N=64, C=6):
    pts = rng.standard_normal((B, N, C)).astype(np.float32)
    # make channels 3:6 unit normals so norm-preservation is easy to read
    if C >= 6:
        pts[..., 3:6] /= np.linalg.norm(pts[..., 3:6], axis=-1, keepdims=True)
    return pts


@pytest.fixture
def nprng():
    return np.random.default_rng(1234)


# ---------------------------------------------------------------- rotations

def test_rotate_preserves_norms_and_pairwise_dist(nprng):
    b = _batch(nprng)
    out = augment.rotate_point_cloud(b, nprng)
    np.testing.assert_allclose(np.linalg.norm(out[..., :3], axis=-1),
                               np.linalg.norm(b[..., :3], axis=-1), atol=1e-4)
    np.testing.assert_allclose(np.linalg.norm(out[..., 3:6], axis=-1),
                               1.0, atol=1e-4)
    # rigid: pairwise distances within each cloud unchanged
    def pdist(x):
        return np.linalg.norm(x[:, :, None, :] - x[:, None, :, :], axis=-1)
    np.testing.assert_allclose(pdist(out[..., :3]), pdist(b[..., :3]),
                               atol=1e-3)


def test_rotate_y_axis_fixes_y_and_rotates_normals_identically(nprng):
    b = _batch(nprng)
    out = augment.rotate_point_cloud(b, np.random.default_rng(7))
    # y-rotation leaves the y coordinate of points AND normals unchanged
    np.testing.assert_allclose(out[..., 1], b[..., 1], atol=1e-5)
    np.testing.assert_allclose(out[..., 4], b[..., 4], atol=1e-5)
    # xyz and normals rotated by the same matrix: dot(p, n) invariant
    dot_in = np.sum(b[..., :3] * b[..., 3:6], -1)
    dot_out = np.sum(out[..., :3] * out[..., 3:6], -1)
    np.testing.assert_allclose(dot_in, dot_out, atol=1e-3)


def test_rotate_by_angle_golden():
    # provider.py row-vector convention p @ R, R_y = [[c,0,s],[0,1,0],[-s,0,c]]
    # at angle pi/2: (x, y, z) -> (-z, y, x)
    b = np.array([[[1.0, 2.0, 3.0, 0.0, 1.0, 0.0]]], np.float32)
    out = augment.rotate_point_cloud_by_angle(b, np.pi / 2)
    np.testing.assert_allclose(out[0, 0, :3], [-3.0, 2.0, 1.0], atol=1e-5)
    out_n = augment.rotate_point_cloud_by_angle_with_normal(b, np.pi / 2)
    np.testing.assert_allclose(out_n[0, 0, 3:6], [0.0, 1.0, 0.0], atol=1e-6)


def test_rotate_z_fixes_z(nprng):
    b = _batch(nprng, C=3)
    out = augment.rotate_point_cloud_z(b, nprng)
    np.testing.assert_allclose(out[..., 2], b[..., 2], atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1),
                               np.linalg.norm(b, axis=-1), atol=1e-4)


def test_perturbation_is_small_and_rigid(nprng):
    b = _batch(nprng)
    out = augment.rotate_perturbation_point_cloud(b, nprng)
    # angles clipped to 0.18 rad per axis -> displacement bounded
    disp = np.linalg.norm(out[..., :3] - b[..., :3], axis=-1)
    r = np.linalg.norm(b[..., :3], axis=-1)
    assert np.all(disp <= r * 3 * 0.18 + 1e-4)
    np.testing.assert_allclose(np.linalg.norm(out[..., 3:6], axis=-1),
                               1.0, atol=1e-4)


def test_with_normal_aliases_match_base(nprng):
    b = _batch(nprng)
    a = augment.rotate_point_cloud_with_normal(b, np.random.default_rng(5))
    c = augment.rotate_point_cloud(b, np.random.default_rng(5))
    np.testing.assert_array_equal(a, c)


# ------------------------------------------------------- pointwise / affine

def test_jitter_bounds_and_channels(nprng):
    b = _batch(nprng)
    out = augment.jitter_point_cloud(b, nprng, sigma=0.01, clip=0.05)
    d = out - b
    assert np.all(np.abs(d[..., :3]) <= 0.05 + 1e-6)
    assert np.any(d[..., :3] != 0)
    np.testing.assert_array_equal(d[..., 3:], 0)  # normals untouched


def test_shift_is_per_cloud_constant(nprng):
    b = _batch(nprng)
    out = augment.shift_point_cloud(b, nprng, shift_range=0.1)
    d = out[..., :3] - b[..., :3]
    # same shift for every point within a cloud (f32 add/sub round-trip)
    np.testing.assert_allclose(d, np.broadcast_to(d[:, :1, :], d.shape), atol=1e-5)
    assert np.all(np.abs(d) <= 0.1)
    np.testing.assert_array_equal(out[..., 3:], b[..., 3:])


def test_scale_is_per_cloud_scalar(nprng):
    b = _batch(nprng)
    out = augment.random_scale_point_cloud(b, nprng)
    ratio = out[..., :3] / b[..., :3]
    np.testing.assert_allclose(ratio, np.broadcast_to(ratio[:, :1, :1], ratio.shape), rtol=1e-3)
    assert np.all(ratio >= 0.8 - 1e-5) and np.all(ratio <= 1.25 + 1e-5)


def test_random_point_dropout_replaces_with_first_point(nprng):
    b = _batch(nprng, B=8, N=256)
    out = augment.random_point_dropout(b, nprng)
    changed = np.any(out != b, axis=-1)  # (B, N)
    # every changed row equals that cloud's (possibly updated) first point
    for bi in range(b.shape[0]):
        rows = np.where(changed[bi])[0]
        for n in rows:
            np.testing.assert_array_equal(out[bi, n], out[bi, 0])
    # some clouds drop a nontrivial fraction
    assert changed.mean() > 0.05


# ------------------------------------------------------------- shuffles

def test_shuffle_points_same_perm_whole_batch(nprng):
    b = _batch(nprng)
    out = augment.shuffle_points(b, np.random.default_rng(3))
    # batch-constant permutation: recover it from cloud 0, apply to all
    perm = np.array([np.where((b[0] == row).all(-1))[0][0] for row in out[0]])
    np.testing.assert_array_equal(out, b[:, perm])
    assert not np.array_equal(perm, np.arange(b.shape[1]))


def test_shuffle_data_consistent(nprng):
    b = _batch(nprng)
    labels = np.arange(b.shape[0])
    d, l, perm = augment.shuffle_data(b, labels, nprng)
    np.testing.assert_array_equal(d, b[perm])
    np.testing.assert_array_equal(l, labels[perm])
    np.testing.assert_array_equal(np.sort(perm), np.arange(b.shape[0]))


# ------------------------------------------------------------- pipelines

def test_cls_pipelines_shapes(nprng):
    b = _batch(nprng)
    for fn in (augment.augment_cls_batch, augment.augment_cls_batch_with_normals):
        out = fn(b, np.random.default_rng(11))
        assert out.shape == b.shape and out.dtype == np.float32
        assert not np.array_equal(out, b)


# ------------------------------------------------------- on-device variants

def test_jax_rotate_matches_golden():
    b = jnp.asarray([[[1.0, 2.0, 3.0, 0.0, 0.0, 1.0]]], jnp.float32)
    out = np.asarray(augment_jax.rotate_by_angle(b, jnp.pi / 2))
    np.testing.assert_allclose(out[0, 0, :3], [-3.0, 2.0, 1.0], atol=1e-4)
    np.testing.assert_allclose(out[0, 0, 3:6], [-1.0, 0.0, 0.0], atol=1e-4)


def test_jax_transforms_invariants(nprng):
    b = jnp.asarray(_batch(nprng))
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)

    rot = np.asarray(augment_jax.rotate_y(ks[0], b))
    np.testing.assert_allclose(np.linalg.norm(rot[..., :3], axis=-1),
                               np.linalg.norm(np.asarray(b[..., :3]), axis=-1),
                               atol=1e-3)
    np.testing.assert_allclose(rot[..., 1], np.asarray(b[..., 1]), atol=1e-5)

    rz = np.asarray(augment_jax.rotate_z(ks[1], b))
    np.testing.assert_allclose(rz[..., 2], np.asarray(b[..., 2]), atol=1e-5)

    jit_out = np.asarray(augment_jax.jitter(ks[2], b))
    assert np.all(np.abs(jit_out[..., :3] - np.asarray(b[..., :3])) <= 0.05 + 1e-6)
    np.testing.assert_array_equal(jit_out[..., 3:], np.asarray(b[..., 3:]))

    sh = np.asarray(augment_jax.shift(ks[3], b))
    d = sh[..., :3] - np.asarray(b[..., :3])
    np.testing.assert_allclose(d, np.broadcast_to(d[:, :1, :], d.shape), atol=1e-5)

    sc = np.asarray(augment_jax.random_scale(ks[4], b))
    ratio = sc[..., :3] / np.asarray(b[..., :3])
    np.testing.assert_allclose(ratio, np.broadcast_to(ratio[:, :1, :1], ratio.shape), rtol=1e-2)

    sp = np.asarray(augment_jax.shuffle_points(ks[5], b))
    b0 = np.asarray(b)
    assert sorted(map(tuple, sp[0, :, :3])) == sorted(map(tuple, b0[0, :, :3]))

    dp = np.asarray(augment_jax.random_point_dropout(ks[6], b))
    changed = np.any(dp != b0, axis=-1)
    for bi in range(b0.shape[0]):
        for n in np.where(changed[bi])[0]:
            np.testing.assert_array_equal(dp[bi, n], dp[bi, 0])


def test_jax_pipelines_jittable(nprng):
    b = jnp.asarray(_batch(nprng))
    key = jax.random.PRNGKey(1)
    for fn in (augment_jax.augment_cls, augment_jax.augment_cls_normals,
               augment_jax.augment_scannet):
        out = jax.jit(fn)(key, b)
        assert out.shape == b.shape
        assert bool(jnp.all(jnp.isfinite(out)))


def test_normals_chain_is_paper_recipe_order(nprng):
    """The XYZ+normal chain must apply dropout LAST (after jitter +
    shuffle), as the reference's commented provider.random_point_dropout
    sits after next_batch(augment=True) (train.py:201-202): dropped
    points must be EXACT 6-channel copies of the cloud's first point.
    If dropout ran before jitter, copies would differ by independent
    jitter noise; if jitter were missing, xyz would be an exact affine
    image of the input."""
    b = _batch(nprng, N=256)
    # numpy chain
    out = augment.augment_cls_batch_with_normals(b, np.random.default_rng(3))
    for bi in range(out.shape[0]):
        first = out[bi, 0]
        dup = np.all(out[bi] == first, axis=-1)
        assert dup.sum() >= 2, "expected dropped points somewhere"
    # jax chain: same exact-copy property
    outj = np.asarray(augment_jax.augment_cls_normals(jax.random.PRNGKey(5),
                                                      jnp.asarray(b)))
    total_dups = 0
    for bi in range(outj.shape[0]):
        total_dups += int(np.all(outj[bi] == outj[bi, 0], axis=-1).sum())
    assert total_dups > outj.shape[0], "expected dropout duplicates"
    # jitter present: normals stay unit (rotations), xyz must NOT be a
    # rigid+scale image of the input (jitter breaks exact affinity)
    nrm = np.linalg.norm(out[..., 3:6], axis=-1)
    keep = ~np.all(out == out[:, :1, :], axis=-1)
    np.testing.assert_allclose(nrm[keep], 1.0, atol=1e-4)
