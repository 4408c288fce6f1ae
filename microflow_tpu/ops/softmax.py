"""Quantized Softmax (reference R10, ``src/ops/softmax.rs``).

The reference deliberately does NOT subtract the input zero-point:

    e_i  = f32(q_i) * in_scale            # src/ops/softmax.rs:36
    sum  = sum_i expf(e_i)
    out  = quantize(expf(e_i) / sum, out_scale, out_zp)

Softmax is shift-invariant, so skipping the zero-point only rescales
numerator and denominator identically -- mathematically equal, and we
replicate the exact float recipe for parity.  ``expf`` may differ from
XLA's exp by 1 ULP on some inputs; the engine's parity contract is
<= 1 output LSB.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.numerics import f32, round_away, saturating_cast


def softmax(
    x: jax.Array,  # [B, N] quantized ints
    *,
    in_scale: float,
    out_scale: float,
    out_zp: int,
) -> jax.Array:
    out_dtype = x.dtype
    e = f32(x) * jnp.float32(in_scale)  # NO zero-point subtraction (by design)
    ex = jnp.exp(e)
    total = jnp.sum(ex, axis=-1, keepdims=True)
    y = round_away(ex / total / jnp.float32(out_scale) + jnp.float32(out_zp))
    return saturating_cast(y, out_dtype)
