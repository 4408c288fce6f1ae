"""Quantized AveragePool2D (reference R9, ``src/ops/average_pool_2d.rs``).

Per output pixel the reference computes

    x = (1 / len) * f32(sum_over_view)        # f32 reciprocal, then mul
    y = roundf(C0 * x + C1)                   # C0 = in_s/out_s,
                                              # C1 = out_zp - in_s*in_zp/out_s

where the view is ZERO-filled (true 0, not in_zp) and ``len`` counts only
in-bounds elements (``src/ops/average_pool_2d.rs:82-95``).  We fold
``1/len`` into a static f32 reciprocal plane and keep the exact multiply
order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.activation import FusedActivation, apply_fused_activation
from ..core.numerics import f32, round_away, saturating_cast
from ..core.tensor import ViewGeometry, extract_patches


def average_pool_2d(
    x: jax.Array,  # [B, H, W, C] quantized ints
    *,
    geom: ViewGeometry,
    c0: float,  # f32
    c1: float,  # f32
    out_scale: float,
    out_zp: int,
    activation: FusedActivation,
) -> jax.Array:
    out_dtype = x.dtype
    patches = extract_patches(x, geom, pad_value=0)  # [B, OH, OW, KH, KW, C]
    s = jnp.sum(patches.astype(jnp.int32), axis=(3, 4))  # [B, OH, OW, C]
    # static per-pixel reciprocal of the valid-element count
    recip = (np.float32(1.0) / geom.len_plane().astype(np.float32)).astype(np.float32)
    mean = jnp.asarray(recip)[None, :, :, None] * f32(s)
    y = round_away(jnp.float32(c0) * mean + jnp.float32(c1))
    y = saturating_cast(y, out_dtype)
    return apply_fused_activation(y, activation, out_scale, out_zp)
