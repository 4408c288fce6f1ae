"""Integer backward kernels (reference R13-R15, R17:
``src/gradient_fully_connected.rs``, ``gradient_conv_2d.rs``,
``gradient_depthwise_conv_2d.rs``, ``gradient_average_pool.rs``).

Gradients flow between layers as raw i32 quantized-domain deltas.
Activation masking is straight-through: outputs that a fused ReLU/ReLU6
pinned to the rail pass no gradient.

Reference quirks replicated on purpose (cited at each site):

* FC *input* gradients mask on the RAW quantized output (> 0), while
  weight/bias gradients mask on ``output - zero_point``;
* conv gradients are normalized per *sample* by sums of |dOut| (per
  weight-tap for conv, one scalar for depthwise) and rounded before a
  saturating i32 accumulation across the batch -- so the batched form
  runs the per-sample math under vmap and folds in batch order;
* 0/0 normalization produces NaN in Rust, which casts to 0 via ``as``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..compiler.ir import (
    AveragePool2DLayer,
    Conv2DLayer,
    DepthwiseConv2DLayer,
    FullyConnectedLayer,
)
from ..core.activation import FusedActivation, quantize_scalar
from ..core.numerics import f32, round_away, saturating_sub_int
from ..core.tensor import extract_patches


def _sat_cast_nan0(x: jax.Array, dtype) -> jax.Array:
    """Rust ``as`` from f32: saturating, NaN -> 0."""
    info = jnp.iinfo(dtype)
    y = jnp.where(jnp.isnan(x), 0.0, jnp.clip(x, info.min, info.max))
    return y.astype(dtype)


def activity_mask(out_q, activation: FusedActivation, out_scale, out_zp, *, raw: bool):
    """Which outputs pass gradient.  ``raw=True`` replicates the FC
    input-grad quirk (``gradient_fully_connected.rs:171-177``: compares
    the raw quantized output, not output - zp)."""
    if activation is FusedActivation.NONE:
        return jnp.ones(out_q.shape, bool)
    val = out_q if raw else saturating_sub_int(out_q, jnp.asarray(out_zp, out_q.dtype))
    if activation is FusedActivation.RELU:
        return val > 0
    q6 = quantize_scalar(6.0, out_scale, out_zp, np.dtype(out_q.dtype))
    return (val > 0) & (val < jnp.asarray(q6, val.dtype))


# --- FullyConnected ---------------------------------------------------------


def fc_backward(layer: FullyConnectedLayer, x_q, out_q, weights, d_out):
    """Returns (dW i32 [K,N] summed over batch, bias_grad f32 [N], dIn i32 [B,K]).

    Reference ``update_grad_fully_connected`` (``gradient_fully_connected.rs:11-61``).
    """
    act, os_, oz = layer.activation, layer.out_q.scale0, layer.out_q.zp0
    mask_w = activity_mask(out_q, act, os_, oz, raw=False)
    md_w = jnp.where(mask_w, d_out, 0)
    xc = x_q.astype(jnp.int32) - jnp.int32(layer.in_q.zp0)
    dW = lax.dot(xc.T, md_w, preferred_element_type=jnp.int32)  # [K, N]
    bias_grad = f32(jnp.sum(md_w, axis=0))  # [N]
    mask_in = activity_mask(out_q, act, os_, oz, raw=True)
    md_in = jnp.where(mask_in, d_out, 0)
    wc = weights.astype(jnp.int32) - jnp.int32(layer.w_q.zp0)
    d_in = lax.dot(md_in, wc.T, preferred_element_type=jnp.int32)  # [B, K]
    return dW, bias_grad, d_in


def fc_backward_float(layer: FullyConnectedLayer, x_q, out_q, weights, d_out_f32):
    """The reference's "unquantized" f32 twins of the FC gradients
    (``gradient_fully_connected.rs:118-152`` weights, ``:198-232`` input,
    ``:268-299`` bias) -- dequantized-domain gradients with the same
    activation masking, kept for experimentation parity (the generated
    train code never calls them; R13 in SURVEY.md).

    Returns (dW f32 [K,N], bias_grad f32 [N], dIn f32 [B,K])."""
    act, os_, oz = layer.activation, layer.out_q.scale0, layer.out_q.zp0
    mask_w = activity_mask(out_q, act, os_, oz, raw=False)
    md_w = jnp.where(mask_w, d_out_f32, 0.0).astype(jnp.float32)
    # weights grad: dequantized input (in_scale * (x - in_zp)) outer grad
    xd = jnp.float32(layer.in_q.scale0) * (f32(x_q) - jnp.float32(layer.in_q.zp0))
    dW = xd.T @ md_w  # [K, N]
    bias_grad = jnp.sum(md_w, axis=0)  # [N] (the scale factor is commented
    # out in the reference, gradient_fully_connected.rs:295-297)
    # input grad masks on the RAW quantized output (same quirk as the
    # integer path, :171-177 vs :206-212)
    mask_in = activity_mask(out_q, act, os_, oz, raw=True)
    md_in = jnp.where(mask_in, d_out_f32, 0.0).astype(jnp.float32)
    wd = jnp.float32(layer.w_q.scale0) * (f32(weights) - jnp.float32(layer.w_q.zp0))
    d_in = md_in @ wd.T  # [B, K]
    return dW, bias_grad, d_in


# --- Conv2D -----------------------------------------------------------------


def _scatter_frame(geom, KH, KW):
    """(hp, wp, hp_eff, wp_eff): the backward scatter frame.  The
    transpose-scatter touches exactly [0, K + s*(O-1)) in each padded
    dim (``hp_eff``); ``hp`` keeps the original frame when the input
    extent is larger (positions the scatter never reaches stay zero)."""
    top, bottom, left, right = geom.pad_amounts()
    hp_eff = geom.k_rows + geom.stride_rows * (geom.out_rows - 1)
    wp_eff = geom.k_cols + geom.stride_cols * (geom.out_cols - 1)
    hp = max(geom.in_rows + top + bottom, hp_eff)
    wp = max(geom.in_cols + left + right, wp_eff)
    return hp, wp, hp_eff, wp_eff


def _transpose_pad(md, KH, KW, sr, sc):
    """Interior-dilate ``md`` [OH,OW,C] by the stride and add K-1 zeros
    on every side: slice ``[K-1-m : K-1-m+hp_eff]`` then reads exactly
    the transpose-scatter term for tap (m, n) -- the pad+static-slice
    form of ``at[m::s, n::s].add`` with no scatter op."""
    return lax.pad(
        md, jnp.asarray(0, md.dtype),
        ((KH - 1, KH - 1, sr - 1), (KW - 1, KW - 1, sc - 1), (0, 0, 0)))


def _tap_slices(geom, KH, KW):
    """Strided input-window slice bounds per tap: tap (m, n) of every
    output window reads ``xp[m : m+s*(O-1)+1 : s]`` of the padded input
    (the per-tap column of ``extract_patches`` without materializing the
    [OH,OW,KH,KW,C] patch tensor)."""
    sr, sc = geom.stride_rows, geom.stride_cols
    rh = sr * (geom.out_rows - 1) + 1
    rw = sc * (geom.out_cols - 1) + 1
    return [((m, m + rh, sr), (n, n + rw, sc)) for m in range(KH) for n in range(KW)]


def _split_i8(m):
    """Exact int8 split of an i32 array with values in [-255, 255]:
    m == 128*mh + ml, mh = m >> 7 in [-2, 1], ml in [0, 127].  Lets an
    i32 contraction run as TWO int8 MXU matmuls (the MXU has no i32
    mode; XLA emulates i32 multiplies on the VPU).  Bit-exact -- pure
    integer identity (scripts/probe_bwd_mxu.py)."""
    mh = (m >> 7).astype(jnp.int8)
    ml = (m - 128 * (m >> 7)).astype(jnp.int8)
    return mh, ml


def conv_backward_sample(layer: Conv2DLayer, x_q, out_q, weights, d_out, w_zp_vec,
                         md_small: bool = False):
    """Per-sample conv gradients (``gradient_conv_2d.rs``), scatter-free.

    x_q [H,W,C], out_q/d_out [OH,OW,F] -> (dW_q int8 [F,KH,KW,C],
    bias_grad f32 [F], dIn i32 [H,W,C]).

    Bit-identical to :func:`conv_backward_sample_scatter` (the direct
    transcription, kept as the oracle): integer sums are
    order-independent and i32 wraps consistently, so replacing the
    KHxKW ``at[].add`` scatters with pad+static-slice terms and the
    patch-tensor einsum with per-tap strided-slice einsums changes
    nothing but the lowering (round-4 VERDICT task 5: the scatter form
    was 73% of the train step at B=1024).

    ``md_small=True`` asserts (statically, derived by the trainer from
    the graph -- see ``TrainableModel._derive_md_bounds``) that every
    ``d_out`` entry is in [-255, 255]; the dW and dIn contractions then
    run as exact int8 MXU matmuls via :func:`_split_i8` plus the
    zero-point correction terms, instead of VPU-emulated i32 einsums."""
    geom = layer.geom
    act, os_, oz = layer.activation, layer.out_q.scale0, layer.out_q.zp0
    in_zp = layer.in_q.zp0
    F_, KH, KW, C = layer.filters.shape
    sr, sc = geom.stride_rows, geom.stride_cols
    mask = activity_mask(out_q, act, os_, oz, raw=False)
    md = jnp.where(mask, d_out, 0)  # [OH, OW, F] i32
    amd = jnp.abs(md)

    # weights gradient: per-tap strided slices of the zp-padded input
    # (padding with in_zp then centering makes OOB taps exactly 0, the
    # same identity extract_patches used)
    top, bottom, left, right = geom.pad_amounts()
    H, W = geom.in_rows, geom.in_cols
    xp = jnp.pad(x_q, ((top, bottom), (left, right), (0, 0)),
                 constant_values=np.asarray(in_zp, x_q.dtype))
    taps = _tap_slices(geom, KH, KW)
    if md_small and x_q.dtype == jnp.int8:
        # einsum(x - zp, md) == 128*dot(x, mh) + dot(x, ml)
        #                        - in_zp * colsum(md)  (exact in i32)
        mh, ml = _split_i8(md)
        md_cs = jnp.sum(md, axis=(0, 1))  # [F]
        dw_acc = jnp.stack(
            [128 * jnp.einsum("ijc,ijf->fc", xp[h0:h1:hs, w0:w1:ws, :], mh,
                              preferred_element_type=jnp.int32)
             + jnp.einsum("ijc,ijf->fc", xp[h0:h1:hs, w0:w1:ws, :], ml,
                          preferred_element_type=jnp.int32)
             - jnp.int32(in_zp) * md_cs[:, None]
             for (h0, h1, hs), (w0, w1, ws) in taps],
            axis=1).reshape(F_, KH, KW, C)
    else:
        xc = xp.astype(jnp.int32) - jnp.int32(in_zp)
        dw_acc = jnp.stack(
            [jnp.einsum("ijc,ijf->fc",
                        xc[h0:h1:hs, w0:w1:ws, :], md)
             for (h0, h1, hs), (w0, w1, ws) in taps],
            axis=1).reshape(F_, KH, KW, C)
    valid = jnp.asarray(geom.valid_mask_plane(), jnp.int32)  # [OH,OW,KH,KW]
    norm_w = jnp.einsum("ijmn,ijf->fmn", valid, amd)  # [F,KH,KW]
    dw_q = _sat_cast_nan0(round_away(f32(dw_acc) / f32(norm_w)[..., None]), jnp.int8)

    # bias gradient: masked sum / signed total (``gradient_conv_2d.rs:251-301``)
    norm_b = jnp.sum(f32(d_out))
    bias_grad = f32(jnp.sum(md, axis=(0, 1))) / norm_b  # [F]

    # input gradient: transpose of the forward taps, as pad+slice terms
    hp, wp, hp_eff, wp_eff = _scatter_frame(geom, KH, KW)
    wc = weights.astype(jnp.int32) - jnp.asarray(w_zp_vec, jnp.int32)[:, None, None, None]
    md_pp = _transpose_pad(md, KH, KW, sr, sc)
    amd_pp = _transpose_pad(jnp.sum(amd, axis=-1, keepdims=True), KH, KW, sr, sc)
    d_eff = jnp.zeros((hp_eff, wp_eff, C), jnp.int32)
    n_eff = jnp.zeros((hp_eff, wp_eff, 1), jnp.int32)
    if md_small:
        # einsum(md, w - wzp) == 128*dot(mh, w) + dot(ml, w)
        #                         - (md @ wzp) broadcast over c
        mh_pp, ml_pp = _split_i8(md_pp)
        wzp = jnp.asarray(w_zp_vec, jnp.int32)
        corr_pp = (md_pp @ wzp)[..., None] if np.any(np.asarray(w_zp_vec)) else None
    for m in range(KH):
        for n in range(KW):
            lo_h, lo_w = KH - 1 - m, KW - 1 - n
            if md_small:
                sh = mh_pp[lo_h : lo_h + hp_eff, lo_w : lo_w + wp_eff, :]
                so = ml_pp[lo_h : lo_h + hp_eff, lo_w : lo_w + wp_eff, :]
                term = (128 * jnp.einsum("ijf,fc->ijc", sh, weights[:, m, n, :],
                                         preferred_element_type=jnp.int32)
                        + jnp.einsum("ijf,fc->ijc", so, weights[:, m, n, :],
                                     preferred_element_type=jnp.int32))
                if corr_pp is not None:
                    term = term - corr_pp[lo_h : lo_h + hp_eff,
                                          lo_w : lo_w + wp_eff, :]
                d_eff = d_eff + term
            else:
                sl = md_pp[lo_h : lo_h + hp_eff, lo_w : lo_w + wp_eff, :]
                d_eff = d_eff + jnp.einsum("ijf,fc->ijc", sl, wc[:, m, n, :])
            n_eff = n_eff + amd_pp[lo_h : lo_h + hp_eff,
                                   lo_w : lo_w + wp_eff, :]
    if (hp, wp) != (hp_eff, wp_eff):
        d_eff = jnp.pad(d_eff, ((0, hp - hp_eff), (0, wp - wp_eff), (0, 0)))
        n_eff = jnp.pad(n_eff, ((0, hp - hp_eff), (0, wp - wp_eff), (0, 0)))
    d_in_acc = d_eff[top : top + H, left : left + W]
    norm_in = n_eff[top : top + H, left : left + W]
    d_in = _sat_cast_nan0(round_away(f32(d_in_acc) / f32(norm_in)), jnp.int32)
    return dw_q, bias_grad, d_in


def conv_backward_sample_scatter(layer: Conv2DLayer, x_q, out_q, weights, d_out, w_zp_vec,
                                 md_small: bool = False):
    """The direct transcription of ``gradient_conv_2d.rs`` (patch-tensor
    einsum + KHxKW ``at[].add`` scatters) -- the oracle the production
    :func:`conv_backward_sample` must stay bit-equal to
    (tests/test_train.py)."""
    geom = layer.geom
    act, os_, oz = layer.activation, layer.out_q.scale0, layer.out_q.zp0
    in_zp = layer.in_q.zp0
    F_, KH, KW, C = layer.filters.shape
    mask = activity_mask(out_q, act, os_, oz, raw=False)
    md = jnp.where(mask, d_out, 0)  # [OH, OW, F] i32
    amd = jnp.abs(md)

    # weights gradient, normalized per tap by sum of |dOut| where valid
    patches = extract_patches(x_q[None], geom, pad_value=in_zp)[0]  # [OH,OW,KH,KW,C]
    centered = patches.astype(jnp.int32) - jnp.int32(in_zp)
    dw_acc = jnp.einsum("ijmnc,ijf->fmnc", centered, md)
    valid = jnp.asarray(geom.valid_mask_plane(), jnp.int32)  # [OH,OW,KH,KW]
    norm_w = jnp.einsum("ijmn,ijf->fmn", valid, amd)  # [F,KH,KW]
    dw_q = _sat_cast_nan0(round_away(f32(dw_acc) / f32(norm_w)[..., None]), jnp.int8)

    # bias gradient: masked sum / signed total (``gradient_conv_2d.rs:251-301``)
    norm_b = jnp.sum(f32(d_out))
    bias_grad = f32(jnp.sum(md, axis=(0, 1))) / norm_b  # [F]

    # input gradient: transpose-scatter of masked dOut through centered
    # weights, per-element normalization by the same |dOut| scatter
    top, bottom, left, right = geom.pad_amounts()
    H, W = geom.in_rows, geom.in_cols
    hp = max(H + top + bottom, KH + geom.stride_rows * (geom.out_rows - 1))
    wp = max(W + left + right, KW + geom.stride_cols * (geom.out_cols - 1))
    wc = weights.astype(jnp.int32) - jnp.asarray(w_zp_vec, jnp.int32)[:, None, None, None]
    d_inp = jnp.zeros((hp, wp, C), jnp.int32)
    norm_inp = jnp.zeros((hp, wp, 1), jnp.int32)
    amd_f = jnp.sum(amd, axis=-1, keepdims=True)  # [OH,OW,1]
    sr, sc = geom.stride_rows, geom.stride_cols
    oh, ow = geom.out_rows, geom.out_cols
    for m in range(KH):
        for n in range(KW):
            contrib = jnp.einsum("ijf,fc->ijc", md, wc[:, m, n, :])
            d_inp = d_inp.at[m : m + sr * oh : sr, n : n + sc * ow : sc, :].add(contrib)
            norm_inp = norm_inp.at[m : m + sr * oh : sr, n : n + sc * ow : sc, :].add(amd_f)
    d_in_acc = d_inp[top : top + H, left : left + W]
    norm_in = norm_inp[top : top + H, left : left + W]
    d_in = _sat_cast_nan0(round_away(f32(d_in_acc) / f32(norm_in)), jnp.int32)
    return dw_q, bias_grad, d_in


# --- DepthwiseConv2D --------------------------------------------------------


def dwconv_backward_sample(layer: DepthwiseConv2DLayer, x_q, out_q, weights, d_out, w_zp_vec):
    """Per-sample depthwise gradients (``gradient_depthwise_conv_2d.rs``),
    scatter-free (same pad+slice rewrite as :func:`conv_backward_sample`;
    bit-equal to :func:`dwconv_backward_sample_scatter`).

    Requires IN_C == CH (the reference's gradient code indexes out of
    bounds for the depth-multiplier case and is never exercised there).
    """
    geom = layer.geom
    act, os_, oz = layer.activation, layer.out_q.scale0, layer.out_q.zp0
    in_zp = layer.in_q.zp0
    KH, KW, CH = layer.weights.shape
    if x_q.shape[-1] != CH:
        raise NotImplementedError(
            "depthwise training with depth multiplier != 1 (reference panics here too)"
        )
    sr, sc = geom.stride_rows, geom.stride_cols
    norm = jnp.sum(jnp.abs(f32(d_out)))
    mask = activity_mask(out_q, act, os_, oz, raw=False)
    md = jnp.where(mask, d_out, 0)  # [OH,OW,CH]

    top, bottom, left, right = geom.pad_amounts()
    H, W = geom.in_rows, geom.in_cols
    xp = jnp.pad(x_q, ((top, bottom), (left, right), (0, 0)),
                 constant_values=np.asarray(in_zp, x_q.dtype))
    xc = xp.astype(jnp.int32) - jnp.int32(in_zp)
    taps = _tap_slices(geom, KH, KW)
    dw_acc = jnp.stack(
        [jnp.sum(xc[h0:h1:hs, w0:w1:ws, :] * md, axis=(0, 1))
         for (h0, h1, hs), (w0, w1, ws) in taps],
        axis=0).reshape(KH, KW, CH)
    dw_q = _sat_cast_nan0(round_away(f32(dw_acc) / norm), jnp.int8)

    bias_grad = f32(jnp.sum(md, axis=(0, 1)))  # [CH]

    hp, wp, hp_eff, wp_eff = _scatter_frame(geom, KH, KW)
    wc = weights.astype(jnp.int32) - jnp.asarray(w_zp_vec, jnp.int32)[None, None, :]
    md_pp = _transpose_pad(md, KH, KW, sr, sc)
    d_eff = jnp.zeros((hp_eff, wp_eff, CH), jnp.int32)
    for m in range(KH):
        for n in range(KW):
            sl = md_pp[KH - 1 - m : KH - 1 - m + hp_eff,
                       KW - 1 - n : KW - 1 - n + wp_eff, :]
            d_eff = d_eff + sl * wc[None, None, m, n, :].reshape(1, 1, CH)
    if (hp, wp) != (hp_eff, wp_eff):
        d_eff = jnp.pad(d_eff, ((0, hp - hp_eff), (0, wp - wp_eff), (0, 0)))
    d_in_acc = d_eff[top : top + H, left : left + W]
    d_in = _sat_cast_nan0(round_away(f32(d_in_acc) / norm), jnp.int32)
    return dw_q, bias_grad, d_in


def dwconv_backward_sample_scatter(layer: DepthwiseConv2DLayer, x_q, out_q, weights, d_out, w_zp_vec,
                                   md_small: bool = False):
    """Direct transcription oracle for :func:`dwconv_backward_sample`
    (patch tensor + ``at[].add`` scatters)."""
    geom = layer.geom
    act, os_, oz = layer.activation, layer.out_q.scale0, layer.out_q.zp0
    in_zp = layer.in_q.zp0
    KH, KW, CH = layer.weights.shape
    if x_q.shape[-1] != CH:
        raise NotImplementedError(
            "depthwise training with depth multiplier != 1 (reference panics here too)"
        )
    # scalar normalization over ALL |dOut|, unmasked (lines 103-109/190-196)
    norm = jnp.sum(jnp.abs(f32(d_out)))
    mask = activity_mask(out_q, act, os_, oz, raw=False)
    md = jnp.where(mask, d_out, 0)  # [OH,OW,CH]

    patches = extract_patches(x_q[None], geom, pad_value=in_zp)[0]  # [OH,OW,KH,KW,CH]
    centered = patches.astype(jnp.int32) - jnp.int32(in_zp)
    dw_acc = jnp.einsum("ijmnc,ijc->mnc", centered, md)  # [KH,KW,CH]
    dw_q = _sat_cast_nan0(round_away(f32(dw_acc) / norm), jnp.int8)

    # bias: saturating per-pixel adds in the reference; plain sum here
    # (magnitudes are far from i32 range in practice)
    bias_grad = f32(jnp.sum(md, axis=(0, 1)))  # [CH]

    top, bottom, left, right = geom.pad_amounts()
    H, W = geom.in_rows, geom.in_cols
    hp = max(H + top + bottom, KH + geom.stride_rows * (geom.out_rows - 1))
    wp = max(W + left + right, KW + geom.stride_cols * (geom.out_cols - 1))
    wc = weights.astype(jnp.int32) - jnp.asarray(w_zp_vec, jnp.int32)[None, None, :]
    d_inp = jnp.zeros((hp, wp, CH), jnp.int32)
    sr, sc = geom.stride_rows, geom.stride_cols
    oh, ow = geom.out_rows, geom.out_cols
    for m in range(KH):
        for n in range(KW):
            d_inp = d_inp.at[m : m + sr * oh : sr, n : n + sc * ow : sc, :].add(
                md * wc[None, None, m, n, :].reshape(1, 1, CH)
            )
    d_in_acc = d_inp[top : top + H, left : left + W]
    d_in = _sat_cast_nan0(round_away(f32(d_in_acc) / norm), jnp.int32)
    return dw_q, bias_grad, d_in


# --- AveragePool2D ----------------------------------------------------------


def avgpool_backward_sample(layer: AveragePool2DLayer, out_q, d_out):
    """Per-sample scatter of dOut to every contributing input position
    (``gradient_average_pool.rs:10-73``), as pad+slice terms (bit-equal
    to the ``at[].add`` form: integer adds).  out_q/d_out [OH,OW,C] ->
    dIn i32 [H,W,C]."""
    geom = layer.geom
    mask = activity_mask(
        out_q, layer.activation, layer.out_q.scale0, layer.out_q.zp0, raw=False
    )
    md = jnp.where(mask, d_out, 0)
    top, bottom, left, right = geom.pad_amounts()
    H, W, C = geom.in_rows, geom.in_cols, d_out.shape[-1]
    KH, KW = geom.k_rows, geom.k_cols
    sr, sc = geom.stride_rows, geom.stride_cols
    hp, wp, hp_eff, wp_eff = _scatter_frame(geom, KH, KW)
    md_pp = _transpose_pad(md, KH, KW, sr, sc)
    d_eff = jnp.zeros((hp_eff, wp_eff, C), jnp.int32)
    for m in range(KH):
        for n in range(KW):
            d_eff = d_eff + md_pp[KH - 1 - m : KH - 1 - m + hp_eff,
                                  KW - 1 - n : KW - 1 - n + wp_eff, :]
    if (hp, wp) != (hp_eff, wp_eff):
        d_eff = jnp.pad(d_eff, ((0, hp - hp_eff), (0, wp - wp_eff), (0, 0)))
    return d_eff[top : top + H, left : left + W]
