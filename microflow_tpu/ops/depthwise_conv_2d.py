"""Quantized DepthwiseConv2D (reference R8, ``src/ops/depthwise_conv_2d.rs``).

Same padding/decomposition algebra as Conv2D, but output channel c
multiplies view channel c with weight channel c (VPU-friendly: no
contraction over channels).  The reference's channel fallback
``v.get(c).unwrap_or(v[0])`` (``src/ops/depthwise_conv_2d.rs:103``) means:
if the input has fewer channels than the weights (depth-multiplier case,
e.g. speech TinyConv: input C=1, weights C=8), out-of-range channels read
input channel 0.  We replicate that exactly with a static gather index.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.activation import FusedActivation, apply_fused_activation
from ..core.numerics import f32, round_away, saturating_cast
from ..core.tensor import ViewGeometry, extract_patches


def depthwise_conv_2d(
    x: jax.Array,  # [B, H, W, IN_C] quantized ints
    weights: jax.Array,  # [KH, KW, CH] quantized ints (tflite [1,KH,KW,CH] squeezed)
    *,
    geom: ViewGeometry,
    in_zp: int,
    w_zp: np.ndarray,  # i32 [CH] per-channel zero points
    bias0: np.ndarray,  # f32 [CH] = f32(out_zp) + C0
    c1: np.ndarray,  # f32 [CH]
    out_scale: float,
    out_zp: int,
    activation: FusedActivation,
) -> jax.Array:
    out_dtype = x.dtype
    KH, KW, CH = weights.shape
    in_c = x.shape[-1]
    # reference channel fallback: channel c of the view, or channel 0 if
    # the input has fewer channels than the weights
    chan_idx = np.array([c if c < in_c else 0 for c in range(CH)])
    patches = extract_patches(x, geom, pad_value=in_zp)  # [B, OH, OW, KH, KW, IN_C]
    patches = patches[..., chan_idx]  # [B, OH, OW, KH, KW, CH]
    centered = patches.astype(jnp.int32) - jnp.int32(in_zp)
    wc = weights.astype(jnp.int32) - jnp.asarray(w_zp, jnp.int32)[None, None, :]
    q = jnp.sum(centered * wc[None, None, None, :, :, :], axis=(3, 4))  # [B, OH, OW, CH]
    y = round_away(
        jnp.asarray(bias0, jnp.float32)[None, None, None, :]
        + jnp.asarray(c1, jnp.float32)[None, None, None, :] * f32(q)
    )
    y = saturating_cast(y, out_dtype)
    return apply_fused_activation(y, activation, out_scale, out_zp)
