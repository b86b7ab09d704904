"""Global implementation dispatch for the core point ops.

Each core op (FPS, ball query, ...) has two interchangeable implementations:

- ``"xla"``    — pure jax.numpy / lax, runs anywhere (CPU tests, TPU), and is
  the semantic reference.
- ``"pallas"`` — hand-written Pallas TPU kernel, VMEM-resident, used on TPU
  for performance. On non-TPU backends Pallas kernels run in interpreter
  mode so the same code path stays testable on CPU.
- ``"mxu"``    — gather/scatter ops only: the one-hot matmul formulation
  written as a plain XLA einsum. XLA pattern-matches it into its fastest
  TPU gather strategy (measured 2-10x faster than both the Pallas one-hot
  kernels and take_along_axis at PointNet++ shapes, exact for f32 at
  Precision.HIGHEST and for bf16 at default precision).

``"auto"`` (the default) resolves per op family: ``"pallas"`` on TPU for
scan-structured kernels (FPS, ball query), ``"mxu"`` on TPU for
gather/scatter (group_point, gather_point), and ``"xla"`` elsewhere. Tests
override via :func:`set_default_impl` to force each path.
"""

from __future__ import annotations

import contextlib

import jax

_DEFAULT_IMPL = "auto"

_VALID = ("auto", "xla", "pallas", "mxu")


def set_default_impl(impl: str) -> None:
    global _DEFAULT_IMPL
    if impl not in _VALID:
        raise ValueError(f"impl must be one of {_VALID}, got {impl!r}")
    _DEFAULT_IMPL = impl


def get_default_impl() -> str:
    return _DEFAULT_IMPL


def resolve_impl(impl: str | None) -> str:
    """Resolve an op-level impl argument to a concrete implementation."""
    impl = impl or _DEFAULT_IMPL
    if impl == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl not in _VALID:
        raise ValueError(f"impl must be one of {_VALID}, got {impl!r}")
    return impl


def resolve_gather_impl(impl: str | None) -> str:
    """Resolve the impl argument for gather/scatter-shaped ops
    (group_point, gather_point): auto -> "mxu" on TPU, "xla" elsewhere."""
    impl = impl or _DEFAULT_IMPL
    if impl == "auto":
        return "mxu" if jax.default_backend() == "tpu" else "xla"
    if impl not in _VALID:
        raise ValueError(f"impl must be one of {_VALID}, got {impl!r}")
    return impl


def interpret_mode() -> bool:
    """Whether Pallas kernels should run in interpreter mode (non-TPU)."""
    return jax.default_backend() != "tpu"


@contextlib.contextmanager
def default_impl(impl: str):
    """Context manager to temporarily force an implementation."""
    prev = _DEFAULT_IMPL
    set_default_impl(impl)
    try:
        yield
    finally:
        set_default_impl(prev)


# --- fused SA-chain dispatch -------------------------------------------------
#
# The set-abstraction MLP chains (dense+BN+ReLU stacks + max-pool) can run as
# fused Pallas kernels (ops/pallas/fused_mlp.py) instead of discrete XLA ops.
#
# Default: OFF. Measured on TPU v5e (see the fused_mlp module docstring),
# Pallas pipelines cap at ~400-450 GB/s HBM throughput on this platform —
# even a bare copy kernel — while XLA's own fusions for the same chain run
# ~2x faster. The kernels are kept as a tested option for hardware/toolchain
# combinations where that balance differs.

_FUSED_MLP = False


def fused_mlp_enabled() -> bool:
    return _FUSED_MLP


def set_fused_mlp(enabled: bool) -> None:
    global _FUSED_MLP
    _FUSED_MLP = bool(enabled)


@contextlib.contextmanager
def fused_mlp(enabled: bool):
    """Context manager to temporarily toggle the fused SA-chain kernels."""
    prev = _FUSED_MLP
    set_fused_mlp(enabled)
    try:
        yield
    finally:
        set_fused_mlp(prev)


# --- pool-before-affine max-pooling ------------------------------------------
#
# max_S relu(y*a+b) == relu(extremum_S(y)*a+b) exactly (per-channel monotone
# affine), so the SA stacks pool the pre-BN dense output and skip the widest
# tensor's normalize pass (ConvBN.post_pooled_max). On by default; the gate
# exists for A/B comparisons.

_POOLED_MAX = True


def pooled_max_enabled() -> bool:
    return _POOLED_MAX


def set_pooled_max(enabled: bool) -> None:
    global _POOLED_MAX
    _POOLED_MAX = bool(enabled)


@contextlib.contextmanager
def pooled_max(enabled: bool):
    prev = _POOLED_MAX
    set_pooled_max(enabled)
    try:
        yield
    finally:
        set_pooled_max(prev)
