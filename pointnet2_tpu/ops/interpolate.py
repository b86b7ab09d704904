"""3D interpolation ops: three-NN search and inverse-distance interpolation.

TPU-native re-implementations of the reference 3d_interpolation op library
(/root/reference/tf_ops/3d_interpolation/tf_interpolate.cpp). Note the
reference registers these CPU-only — every feature-propagation layer
round-trips GPU->CPU->GPU in the original. Here everything stays on-device.

Semantics parity:
- ``three_nn`` returns SQUARED distances (tf_interpolate.cpp:73), 3 smallest
  with ties broken by lowest index (stable insertion, :74-89). No gradient
  (tf_interpolate.py: `ops.NoGradient('ThreeNN')`).
- ``three_interpolate`` computes out[j] = sum_i points[idx[j,i]] * w[j,i]
  (tf_interpolate.cpp:107-127). The reference backpropagates only into
  `points` (tf_interpolate.py:29-34 returns None for idx/weight); here the
  weight gradient is also defined (harmless — callers stop_gradient weights
  for exact parity), and the points gradient is a deterministic scatter-add.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# Largest M routed to the Pallas kernel (see the dispatch comment below).
_PALLAS_MAX_M = 1 << 16


def three_nn(xyz1: jax.Array, xyz2: jax.Array, impl: str | None = None):
    """3 nearest neighbors of each unknown point among known points.

    xyz1: (B, N, 3) unknown (dense) points; xyz2: (B, M, 3) known (sparse).
    Returns (dist, idx): (B, N, 3) squared distances ascending, (B, N, 3)
    int32 indices into M. On TPU this dispatches to a VMEM-resident Pallas
    kernel (ops/pallas/three_nn.py) that never materialises the (B, N, M)
    distance matrix in HBM; the XLA formulation below is the semantic
    reference.
    """
    from pointnet2_tpu import config

    # The Pallas kernel tiles only the N axis; its (TN, M) VMEM working
    # tiles grow linearly in M, so very large known-point counts (whole
    # scenes) would blow the ~16 MB VMEM budget. Past this bound the HBM
    # distance matrix is unavoidable anyway — use the XLA formulation.
    if (config.resolve_impl(impl) == "pallas"
            and xyz2.shape[1] <= _PALLAS_MAX_M):
        from pointnet2_tpu.ops.pallas.three_nn import three_nn_pallas

        return three_nn_pallas(xyz1, xyz2)
    return _three_nn_xla(xyz1, xyz2)


@jax.jit
def _three_nn_xla(xyz1: jax.Array, xyz2: jax.Array):
    """XLA reference implementation of :func:`three_nn`.

    k=3 is extracted with three masked argmin passes rather than
    ``lax.top_k``: top_k lowers to a full sort along M, which at the
    sem-seg FP1 shape (B=16, N=8192, M=1024) costs ~40 ms on v5e — ~8x the
    cost of three min-reductions over the same distance matrix. argmin's
    first-occurrence rule reproduces the reference's lowest-index
    tie-breaking (tf_interpolate.cpp:74-89) exactly, as top_k did.
    """
    M = xyz2.shape[1]
    diff = xyz1[:, :, None, :] - xyz2[:, None, :, :]
    d2 = jnp.sum(jnp.square(diff), axis=-1)  # (B, N, M)
    if M < 3:
        # Fewer than 3 known points: the reference leaves missing slots at
        # their init values dist=1e40 (inf in f32), idx=0
        # (tf_interpolate.cpp:66-67) — inverse-distance weights then vanish.
        d2 = jnp.pad(d2, ((0, 0), (0, 0), (0, 3 - M)), constant_values=jnp.inf)
    lane = jnp.arange(d2.shape[-1])
    dists, idxs = [], []
    d = d2
    for _ in range(3):
        i = jnp.argmin(d, axis=-1)  # first occurrence = lowest-index ties
        v = jnp.min(d, axis=-1)  # == d[argmin]; fuses with the argmin pass
        dists.append(v)
        idxs.append(i)
        d = jnp.where(lane[None, None, :] == i[..., None], jnp.inf, d)
    dist = jnp.stack(dists, axis=-1)
    idx = jnp.stack(idxs, axis=-1)
    # padded lanes (M < 3) can never be selected: they hold +inf, and
    # argmin over an all-inf row returns lane 0 — already a valid index
    return dist, idx.astype(jnp.int32)


@jax.custom_vjp
def _three_interpolate_xla(points: jax.Array, idx: jax.Array, weight: jax.Array) -> jax.Array:
    gathered = jnp.take_along_axis(points[:, None, :, :], idx[..., None], axis=2)
    return jnp.sum(gathered * weight[..., None], axis=2)


def _three_interpolate_xla_fwd(points, idx, weight):
    return _three_interpolate_xla(points, idx, weight), (points, idx, weight)


def _three_interpolate_xla_bwd(res, g):
    points, idx, weight = res
    B, M, C = points.shape
    N = idx.shape[1]
    # grad wrt points: scatter-add of g * w over the 3 neighbors
    # (deterministic XLA scatter; replaces tf_interpolate.cpp:131-153).
    contrib = (g[:, :, None, :] * weight[..., None]).reshape(B, N * 3, C)
    flat_idx = idx.reshape(B, N * 3)
    grad_points = jnp.zeros((B, M, C), g.dtype)
    grad_points = grad_points.at[jnp.arange(B)[:, None], flat_idx].add(contrib)
    grad_weight = _weight_grad(points, idx, g)
    return grad_points, None, grad_weight


def _weight_grad(points, idx, g):
    # grad wrt weight: <g, points[idx]> per neighbor.
    gathered = jnp.take_along_axis(points[:, None, :, :], idx[..., None], axis=2)
    return jnp.sum(gathered * g[:, :, None, :], axis=-1)


_three_interpolate_xla.defvjp(_three_interpolate_xla_fwd,
                              _three_interpolate_xla_bwd)


@jax.custom_vjp
def _three_interpolate_mxu(points, idx, weight):
    """One-hot MXU formulation: 3 exact one-hot row gathers + f32 weighted
    combine. Same arithmetic (and order) as the take_along_axis form —
    gathered values times f32 weights, summed k=0,1,2 — but each gather is
    an einsum XLA maps onto its fastest TPU gather strategy (measured ~3.5x
    at the sem-seg FP4 shape, where the scatter-grad path is ~16x)."""
    from pointnet2_tpu.ops.grouping import onehot_gather_rows

    out = None
    for k in range(3):
        gk = onehot_gather_rows(points, idx[..., k]).astype(jnp.float32)
        term = gk * weight[..., k:k + 1].astype(jnp.float32)
        out = term if out is None else out + term
    return out.astype(jnp.result_type(points.dtype, weight.dtype))


def _three_interpolate_mxu_fwd(points, idx, weight):
    return _three_interpolate_mxu(points, idx, weight), (points, idx, weight)


def _three_interpolate_mxu_bwd(res, g):
    from pointnet2_tpu.ops.grouping import onehot_scatter_rows

    points, idx, weight = res
    M = points.shape[1]
    grad_points = None
    for k in range(3):
        contrib = (g * weight[..., k:k + 1]).astype(g.dtype)
        gk = onehot_scatter_rows(contrib, idx[..., k], M)
        grad_points = gk if grad_points is None else grad_points + gk
    return grad_points, None, _weight_grad(points, idx, g)


_three_interpolate_mxu.defvjp(_three_interpolate_mxu_fwd,
                              _three_interpolate_mxu_bwd)


def three_interpolate(points: jax.Array, idx: jax.Array, weight: jax.Array,
                      impl: str | None = None) -> jax.Array:
    """Weighted 3-point interpolation.

    points: (B, M, C) known features; idx: (B, N, 3) int32; weight: (B, N, 3).
    Returns (B, N, C).

    On TPU both directions run as one-hot MXU contractions (like
    group_point); the take_along_axis/scatter formulation remains the
    semantic reference (impl="xla").
    """
    from pointnet2_tpu import config

    resolved = config.resolve_gather_impl(impl)
    if resolved in ("mxu", "pallas") and jnp.issubdtype(
            points.dtype, jnp.floating):
        return _three_interpolate_mxu(points, idx, weight)
    return _three_interpolate_xla(points, idx, weight)
