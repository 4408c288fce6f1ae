"""QUANTIZE op: requantize int8/uint8 -> int8/uint8 with new parameters.

The reference has a parser for this op but never registered it and its
codegen was a broken copy of avg-pool (``microflow-macros/src/ops/
quantize.rs``, dead code -- C10 in SURVEY.md).  We implement it properly:

    y = quantize(dequantize(x, in_s, in_zp), out_s, out_zp)
      = roundf((in_s * (x - in_zp)) / out_s + out_zp), saturating cast

which also covers int8 <-> uint8 conversions of uint8-era models.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.numerics import f32, round_away, saturating_cast


def quantize_op(
    x: jax.Array,
    *,
    in_scale: float,
    in_zp: int,
    out_scale: float,
    out_zp: int,
    out_dtype=jnp.int8,
) -> jax.Array:
    deq = jnp.float32(in_scale) * (f32(x) - jnp.float32(in_zp))
    y = round_away(deq / jnp.float32(out_scale) + jnp.float32(out_zp))
    return saturating_cast(y, out_dtype)
