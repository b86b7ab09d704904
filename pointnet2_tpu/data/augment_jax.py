"""On-device (jit-able) point-cloud augmentations keyed by JAX PRNG.

TPU-native counterpart of pointnet2_tpu/data/augment.py: the same transform
family expressed as pure jnp functions so augmentation can run *inside* the
jitted train step — zero host cost, overlapped with compute, and reproducible
from the step RNG. This replaces the reference's per-sample Python loops
(utils/provider.py), which would starve a pod-scale input pipeline.

All functions take (key, batch) and return a new batch; batch is (B, N, 3)
or (B, N, 6) with normals in channels 3:6 (rotations are normal-aware).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _rot_y(angles: jax.Array) -> jax.Array:
    c, s = jnp.cos(angles), jnp.sin(angles)
    z, o = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack([
        jnp.stack([c, z, s], -1),
        jnp.stack([z, o, z], -1),
        jnp.stack([-s, z, c], -1),
    ], axis=-2)


def _rot_z(angles: jax.Array) -> jax.Array:
    c, s = jnp.cos(angles), jnp.sin(angles)
    z, o = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack([
        jnp.stack([c, s, z], -1),
        jnp.stack([-s, c, z], -1),
        jnp.stack([z, z, o], -1),
    ], axis=-2)


def _rot_xyz(angles: jax.Array) -> jax.Array:
    ax, ay, az = angles[:, 0], angles[:, 1], angles[:, 2]
    cx, sx = jnp.cos(ax), jnp.sin(ax)
    cy, sy = jnp.cos(ay), jnp.sin(ay)
    cz, sz = jnp.cos(az), jnp.sin(az)
    z, o = jnp.zeros_like(ax), jnp.ones_like(ax)
    Rx = jnp.stack([jnp.stack([o, z, z], -1),
                    jnp.stack([z, cx, -sx], -1),
                    jnp.stack([z, sx, cx], -1)], axis=-2)
    Ry = jnp.stack([jnp.stack([cy, z, sy], -1),
                    jnp.stack([z, o, z], -1),
                    jnp.stack([-sy, z, cy], -1)], axis=-2)
    Rz = jnp.stack([jnp.stack([cz, -sz, z], -1),
                    jnp.stack([sz, cz, z], -1),
                    jnp.stack([z, z, o], -1)], axis=-2)
    hi = jax.lax.Precision.HIGHEST
    return jnp.matmul(Rz, jnp.matmul(Ry, Rx, precision=hi), precision=hi)


def _apply_rot(batch: jax.Array, R: jax.Array) -> jax.Array:
    # HIGHEST precision: TPU default-precision f32 matmuls run bf16 passes,
    # which makes the rotation visibly non-isometric (~4e-3 relative norm
    # drift); the (N,3)x(3,3) contraction is tiny, so exactness is free
    hi = jax.lax.Precision.HIGHEST
    xyz = jnp.einsum("bnc,bcd->bnd", batch[..., 0:3], R, precision=hi)
    if batch.shape[-1] >= 6:
        nrm = jnp.einsum("bnc,bcd->bnd", batch[..., 3:6], R, precision=hi)
        return jnp.concatenate([xyz, nrm, batch[..., 6:]], axis=-1)
    return jnp.concatenate([xyz, batch[..., 3:]], axis=-1)


def rotate_y(key, batch):
    angles = jax.random.uniform(key, (batch.shape[0],), maxval=2 * jnp.pi)
    return _apply_rot(batch, _rot_y(angles))


def rotate_z(key, batch):
    angles = jax.random.uniform(key, (batch.shape[0],), maxval=2 * jnp.pi)
    return _apply_rot(batch, _rot_z(angles))


def rotate_by_angle(batch, angle):
    angles = jnp.full((batch.shape[0],), angle, batch.dtype)
    return _apply_rot(batch, _rot_y(angles))


def rotate_perturbation(key, batch, angle_sigma=0.06, angle_clip=0.18):
    angles = jnp.clip(
        angle_sigma * jax.random.normal(key, (batch.shape[0], 3)),
        -angle_clip, angle_clip)
    return _apply_rot(batch, _rot_xyz(angles))


def jitter(key, batch, sigma=0.01, clip=0.05):
    noise = jnp.clip(sigma * jax.random.normal(key, batch[..., 0:3].shape),
                     -clip, clip)
    return batch.at[..., 0:3].add(noise)


def shift(key, batch, shift_range=0.1):
    shifts = jax.random.uniform(key, (batch.shape[0], 1, 3),
                                minval=-shift_range, maxval=shift_range)
    return batch.at[..., 0:3].add(shifts)


def random_scale(key, batch, scale_low=0.8, scale_high=1.25):
    scales = jax.random.uniform(key, (batch.shape[0], 1, 1),
                                minval=scale_low, maxval=scale_high)
    return batch.at[..., 0:3].multiply(scales)


def shuffle_points(key, batch):
    """One permutation for the whole batch (diversifies FPS seeds)."""
    perm = jax.random.permutation(key, batch.shape[1])
    return batch[:, perm, :]


def random_point_dropout(key, batch, max_dropout_ratio=0.875):
    k1, k2 = jax.random.split(key)
    B, N = batch.shape[:2]
    ratios = jax.random.uniform(k1, (B, 1)) * max_dropout_ratio
    drop = jax.random.uniform(k2, (B, N)) <= ratios
    first = jnp.broadcast_to(batch[:, 0:1, :], batch.shape)
    return jnp.where(drop[..., None], first, batch)


def augment_cls(key, batch):
    """rotate -> perturb -> scale -> shift -> jitter -> shuffle
    (the ModelNet40 h5 training pipeline, modelnet_h5_dataset.py:72-79)."""
    ks = jax.random.split(key, 6)
    batch = rotate_y(ks[0], batch)
    batch = rotate_perturbation(ks[1], batch)
    batch = random_scale(ks[2], batch)
    batch = shift(ks[3], batch)
    batch = jitter(ks[4], batch)
    return shuffle_points(ks[5], batch)


def augment_cls_normals(key, batch):
    """rotate(+normals) -> perturb -> scale -> shift -> jitter -> shuffle
    -> dropout: the 5000-pt XYZ+normal paper recipe — the full
    _augment_batch_data chain (modelnet_dataset.py:60-72, jitter on xyz
    only) plus random input dropout applied LAST, where the reference's
    commented line sits after next_batch (train.py:201-202,
    README.md:59 side note (2))."""
    ks = jax.random.split(key, 7)
    batch = rotate_y(ks[0], batch)
    batch = rotate_perturbation(ks[1], batch)
    batch = random_scale(ks[2], batch)
    batch = shift(ks[3], batch)
    batch = jitter(ks[4], batch)
    batch = shuffle_points(ks[5], batch)
    return random_point_dropout(ks[6], batch)


def augment_scannet(key, batch):
    """z-rotation only (scannet/train.py:230)."""
    return rotate_z(key, batch)
