"""Quantized Conv2D (reference R7, ``src/ops/conv_2d.rs``).

The reference extracts a zero-filled view per output pixel and assembles
four terms whose exact integer sum is

    q[b] = sum_over_valid (in - in_zp) * (w[b] - w_zp[b])

(``src/ops/conv_2d.rs:100-133``; see ``core/tensor.py`` for the algebra).
We pad the input with ``in_zp`` so the sum becomes a full-window
contraction with no per-pixel correction terms, then lower to im2col +
one MXU matmul -- the TPU-idiomatic shape.

Requantization per filter b (per-channel aware):

    y = roundf(out_zp + C0[b] + C1[b or 0] * f32(q[b]))

with C0[b] = bias_scale[b]/out_scale * (bias[b]-bias_zp[b]) and
C1[k] = in_scale * w_scale[k] / out_scale folded at compile time
(``microflow-macros/src/ops/conv_2d.rs:90-110``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.activation import FusedActivation, apply_fused_activation
from ..core.numerics import f32, round_away, saturating_cast
from ..core.tensor import ViewGeometry, extract_patches


def conv_2d(
    x: jax.Array,  # [B, H, W, C] quantized ints
    filters: jax.Array,  # [F, KH, KW, C] quantized ints (tflite OHWI layout)
    *,
    geom: ViewGeometry,
    in_zp: int,
    w_zp: np.ndarray,  # i32 [F] per-filter zero points (broadcast from quants)
    bias0: np.ndarray,  # f32 [F] = f32(out_zp) + C0
    c1: np.ndarray,  # f32 [F] = C1[b] if per-channel else C1[0] broadcast
    out_scale: float,
    out_zp: int,
    activation: FusedActivation,
) -> jax.Array:
    out_dtype = x.dtype
    F, KH, KW, C = filters.shape
    patches = extract_patches(x, geom, pad_value=in_zp)  # [B, OH, OW, KH, KW, C]
    centered = patches.astype(jnp.int32) - jnp.int32(in_zp)
    wc = filters.astype(jnp.int32) - jnp.asarray(w_zp, jnp.int32)[:, None, None, None]
    q = jnp.einsum(
        "bijmnc,fmnc->bijf", centered, wc, preferred_element_type=jnp.int32
    )  # [B, OH, OW, F] i32 (exact)
    y = round_away(
        jnp.asarray(bias0, jnp.float32)[None, None, None, :]
        + jnp.asarray(c1, jnp.float32)[None, None, None, :] * f32(q)
    )
    y = saturating_cast(y, out_dtype)
    return apply_fused_activation(y, activation, out_scale, out_zp)
