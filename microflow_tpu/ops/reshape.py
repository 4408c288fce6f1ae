"""Reshape op (reference R11, ``src/ops/reshape.rs``) -- a pure row-major
NHWC relayout, batch-preserving."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def reshape(x: jax.Array, target_shape: tuple) -> jax.Array:
    """``target_shape`` is the per-sample shape (without batch dim)."""
    return jnp.reshape(x, (x.shape[0], *target_shape))
