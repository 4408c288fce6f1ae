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
from jax import lax

from ..core.activation import FusedActivation, apply_fused_activation
from ..core.numerics import f32, round_away, saturating_cast
from ..core.tensor import ViewGeometry, extract_patches
from .conv_2d import _pad_same

_DW_DIMNUMS = ("NHWC", "OHWI", "NHWC")


def depthwise_conv_2d_accumulate(
    x: jax.Array, weights: jax.Array, geom: ViewGeometry, in_zp: int, w_zp: np.ndarray
) -> jax.Array:
    """Exact i32 accumulator ``q[b,i,j,c] = sum_mn (x[..,c]-in_zp)(w[m,n,c]-w_zp[c])``
    as a grouped int8 conv (``feature_group_count = C``) plus corrections --
    same algebra as ``conv_2d_accumulate`` but per channel."""
    KH, KW, CH = weights.shape
    xp = _pad_same(x, geom, in_zp)
    strides = (geom.stride_rows, geom.stride_cols)
    w_oi = jnp.transpose(weights, (2, 0, 1))[:, :, :, None]  # [CH, KH, KW, 1] OHWI
    raw = lax.conv_general_dilated(
        xp, w_oi, strides, "VALID",
        dimension_numbers=_DW_DIMNUMS,
        feature_group_count=CH,
        preferred_element_type=jnp.int32,
    )  # [B, OH, OW, CH]
    wzp = jnp.asarray(w_zp, jnp.int32)
    if np.any(np.asarray(w_zp) != 0):
        ones = jnp.ones((CH, KH, KW, 1), x.dtype)
        winsum = lax.conv_general_dilated(
            xp, ones, strides, "VALID",
            dimension_numbers=_DW_DIMNUMS,
            feature_group_count=CH,
            preferred_element_type=jnp.int32,
        )  # [B, OH, OW, CH] per-channel window sums
        raw = raw - winsum * wzp[None, None, None, :]
    wsum = jnp.sum(weights.astype(jnp.int32), axis=(0, 1))  # [CH]
    d = jnp.int32(KH * KW * in_zp) * wzp - jnp.int32(in_zp) * wsum
    return raw + d[None, None, None, :]


def depthwise_conv_2d_accumulate_patches(
    x: jax.Array, weights: jax.Array, geom: ViewGeometry, in_zp: int, w_zp: np.ndarray
) -> jax.Array:
    patches = extract_patches(x, geom, pad_value=in_zp)  # [B, OH, OW, KH, KW, CH]
    centered = patches.astype(jnp.int32) - jnp.int32(in_zp)
    wc = weights.astype(jnp.int32) - jnp.asarray(w_zp, jnp.int32)[None, None, :]
    return jnp.sum(centered * wc[None, None, None, :, :, :], axis=(3, 4))


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
    if in_c == 1 and CH > 1 and x.dtype == jnp.int8:
        # depth-multiplier stem: every output channel reads input channel 0
        # (reference fallback), so this is exactly a regular conv with CH
        # single-channel filters -- avoids materializing the CH-fold
        # channel broadcast at batch scale.
        from .conv_2d import conv_2d_accumulate

        filters = jnp.transpose(weights, (2, 0, 1))[:, :, :, None]  # [CH,KH,KW,1]
        q = conv_2d_accumulate(x, filters, geom, in_zp, w_zp)
    else:
        # reference channel fallback: channel c of the view, or channel 0
        # if the input has fewer channels than the weights
        if in_c != CH:
            chan_idx = np.array([c if c < in_c else 0 for c in range(CH)])
            x = x[..., chan_idx]
        if x.dtype == jnp.int8 and CH <= 16 and not np.any(np.asarray(w_zp) != 0):
            # small-channel dw: XLA's grouped conv is slower than a dense
            # conv on block-diagonal filters (measured on v5e: C=8 grouped
            # 4.26 ms vs dense 3.78 ms at batch 8192); zero taps contribute
            # exactly 0 when w_zp == 0, so the math is unchanged.
            from .conv_2d import conv_2d_accumulate

            eye = jnp.asarray(np.eye(CH, dtype=np.int8))
            wd = jnp.transpose(weights, (2, 0, 1))[:, :, :, None] * eye[:, None, None, :]
            q = conv_2d_accumulate(x, wd, geom, in_zp, np.zeros(CH, np.int32))
        elif x.dtype == jnp.int8:
            q = depthwise_conv_2d_accumulate(x, weights, geom, in_zp, w_zp)
        else:
            q = depthwise_conv_2d_accumulate_patches(x, weights, geom, in_zp, w_zp)
    y = round_away(
        jnp.asarray(bias0, jnp.float32)[None, None, None, :]
        + jnp.asarray(c1, jnp.float32)[None, None, None, :] * f32(q)
    )
    y = saturating_cast(y, out_dtype)
    return apply_fused_activation(y, activation, out_scale, out_zp)
