"""Shared helpers for the Pallas TPU kernels."""

from __future__ import annotations

import jax
import jax.numpy as jnp


# TPU vector lane width: the last-dim tiling quantum for every kernel here
LANE = 128


def round_up(x: int, m: int) -> int:
    """Smallest multiple of m that is >= x."""
    return ((x + m - 1) // m) * m


def exact_copy_precision(dtype):
    """Matmul precision that makes a one-hot contraction an exact copy.

    The MXU truncates f32 operands to bf16 at default precision, which
    would round values moved through a one-hot matmul -> use HIGHEST
    (multi-pass) for f32. bf16 operands are copied exactly at default
    precision (one factor is 1.0), at 3x the f32 throughput.
    """
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
