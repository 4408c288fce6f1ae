"""Cosine similarity accuracy helper (reference R12,
``src/cosine_distance.rs:5-33``) -- batched over the leading dim."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cosine_similarity(a: jax.Array, b: jax.Array) -> jax.Array:
    """f32 cosine similarity of two equally-shaped buffers, flattened per
    leading-dim element."""
    a = jnp.asarray(a, jnp.float32).reshape(a.shape[0], -1)
    b = jnp.asarray(b, jnp.float32).reshape(b.shape[0], -1)
    num = jnp.sum(a * b, axis=1)
    den = jnp.sqrt(jnp.sum(a * a, axis=1)) * jnp.sqrt(jnp.sum(b * b, axis=1))
    return num / den
