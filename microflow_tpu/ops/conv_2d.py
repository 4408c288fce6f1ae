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
from jax import lax

from ..core.activation import FusedActivation, apply_fused_activation
from ..core.numerics import f32, round_away, saturating_cast
from ..core.tensor import ViewGeometry, extract_patches

_DIMNUMS = ("NHWC", "OHWI", "NHWC")  # tflite filter layout is [F, KH, KW, C]


def _pad_same(x: jax.Array, geom: ViewGeometry, in_zp: int) -> jax.Array:
    top, bottom, left, right = geom.pad_amounts()
    return jnp.pad(
        x,
        ((0, 0), (top, bottom), (left, right), (0, 0)),
        constant_values=np.asarray(in_zp, x.dtype),
    )


def conv_2d_accumulate(
    x: jax.Array, filters: jax.Array, geom: ViewGeometry, in_zp: int, w_zp: np.ndarray
) -> jax.Array:
    """Exact i32 accumulator ``q[b,i,j,f] = sum (x - in_zp)(w[f] - w_zp[f])``
    over the (zp-padded) window, as one int8 MXU conv plus corrections:

        q = conv(x, w) - w_zp[f] * winsum + d[f]
        winsum[b,i,j] = conv(x, ones)           (per-pixel window sum)
        d[f] = K*in_zp*w_zp[f] - in_zp*sum(w[f])   (static)

    No im2col materialization: XLA lowers both convs straight to the MXU
    with s8 x s8 -> s32 accumulation.
    """
    F, KH, KW, C = filters.shape
    xp = _pad_same(x, geom, in_zp)
    strides = (geom.stride_rows, geom.stride_cols)
    raw = lax.conv_general_dilated(
        xp, filters, strides, "VALID",
        dimension_numbers=_DIMNUMS, preferred_element_type=jnp.int32,
    )  # [B, OH, OW, F]
    wzp = jnp.asarray(w_zp, jnp.int32)
    if np.any(np.asarray(w_zp) != 0):
        ones = jnp.ones((1, KH, KW, C), x.dtype)
        winsum = lax.conv_general_dilated(
            xp, ones, strides, "VALID",
            dimension_numbers=_DIMNUMS, preferred_element_type=jnp.int32,
        )  # [B, OH, OW, 1]
        raw = raw - winsum * wzp[None, None, None, :]
    # d is cheap per-filter work; filters may be traced (params pytree)
    wsum = jnp.sum(filters.astype(jnp.int32), axis=(1, 2, 3))
    d = jnp.int32(KH * KW * C * in_zp) * wzp - jnp.int32(in_zp) * wsum
    return raw + d[None, None, None, :]


def conv_2d_accumulate_patches(
    x: jax.Array, filters: jax.Array, geom: ViewGeometry, in_zp: int, w_zp: np.ndarray
) -> jax.Array:
    """im2col + einsum form of the same exact accumulator (fallback for
    dtypes XLA's int conv path does not accept, and the training forward)."""
    patches = extract_patches(x, geom, pad_value=in_zp)  # [B, OH, OW, KH, KW, C]
    centered = patches.astype(jnp.int32) - jnp.int32(in_zp)
    wc = filters.astype(jnp.int32) - jnp.asarray(w_zp, jnp.int32)[:, None, None, None]
    return jnp.einsum("bijmnc,fmnc->bijf", centered, wc, preferred_element_type=jnp.int32)


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
    if x.dtype == jnp.int8:
        q = conv_2d_accumulate(x, filters, geom, in_zp, w_zp)
    else:
        q = conv_2d_accumulate_patches(x, filters, geom, in_zp, w_zp)
    y = round_away(
        jnp.asarray(bias0, jnp.float32)[None, None, None, :]
        + jnp.asarray(c1, jnp.float32)[None, None, None, :] * f32(q)
    )
    y = saturating_cast(y, out_dtype)
    return apply_fused_activation(y, activation, out_scale, out_zp)
