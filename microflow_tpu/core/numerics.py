"""Exact float/integer numeric primitives shared by every kernel.

The whole engine promises bit-parity (or <=1 LSB) with the MicroFlow Rust
reference, whose scalar math is:

* ``libm::roundf``  -- round half AWAY from zero (reference
  ``src/quantize.rs:27``),
* Rust ``as`` casts from f32 to i8/u8/i32 -- saturating, NaN -> 0
  (used via ``simba``'s ``to_subset_unchecked`` everywhere, e.g.
  ``src/ops/fully_connected.rs:108``),
* plain IEEE-754 f32 adds/muls, which are deterministic and therefore
  reproduce bit-identically under XLA as long as we keep the same
  association order.

Everything here is jit-safe and shape-polymorphic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# Integer range table for saturating casts.
_INT_INFO = {
    jnp.int8: (-128, 127),
    jnp.uint8: (0, 255),
    jnp.int16: (-32768, 32767),
    jnp.int32: (-(2**31), 2**31 - 1),
}


def round_away(x: jax.Array) -> jax.Array:
    """f32 round-half-away-from-zero, bit-matching ``libm::roundf``."""
    return lax.round(x, lax.RoundingMethod.AWAY_FROM_ZERO)


def saturating_cast(x: jax.Array, dtype) -> jax.Array:
    """Rust ``as`` float->int cast semantics: clamp to the target range.

    The input is expected to already hold integral values (post-round).
    """
    dtype = jnp.dtype(dtype)
    lo, hi = _INT_INFO[dtype.type]
    return jnp.clip(x, lo, hi).astype(dtype)


def saturating_add_i32(a: jax.Array, b: jax.Array) -> jax.Array:
    """i32 saturating add (reference ``accumulate_gradient_4D``,
    ``src/update_layer.rs:289``).  Pure-int32 overflow detection (JAX
    demotes int64 without x64 mode)."""
    a = a.astype(jnp.int32)
    b = b.astype(jnp.int32)
    s = a + b  # wrapping
    overflow = ((a >= 0) == (b >= 0)) & ((s >= 0) != (a >= 0))
    sat = jnp.where(a >= 0, jnp.int32(2**31 - 1), jnp.int32(-(2**31)))
    return jnp.where(overflow, sat, s)


def saturating_sub_int(a: jax.Array, b: jax.Array) -> jax.Array:
    """Saturating subtract in the array's own integer dtype
    (reference ``Saturating::saturating_sub`` on i8)."""
    dtype = jnp.dtype(a.dtype)
    lo, hi = _INT_INFO[dtype.type]
    wide = a.astype(jnp.int32) - b.astype(jnp.int32)
    return jnp.clip(wide, lo, hi).astype(dtype)


def f32(x) -> jax.Array:
    """Explicit float32 conversion (mirrors ``f32::from_subset``)."""
    return jnp.asarray(x).astype(jnp.float32)


def np_f32(x) -> np.ndarray:
    """Host-side float32 conversion for constant folding."""
    return np.asarray(x, dtype=np.float32)


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m
