"""Whole-model fused Pallas kernel ("megakernel").

The XLA backend streams every layer's activations through HBM: for
MicroFlow-class models (<= 0.3 MB of weights, <= 40 KB of activations per
sample) that costs ~50x more HBM traffic than the information content of
the inference.  This backend runs the layer pipeline on VMEM-resident
batch blocks:

* grid = (B / TB,): each program computes TB samples through a whole
  *segment* of consecutive layers;
* every weight/constant array is an input with a constant index_map, so
  Pallas DMAs it once and keeps it VMEM-resident across grid steps;
* HBM traffic collapses to (input read + output write) per segment.

Mosaic layout rules (probed empirically on v5e) shape the design:

* reshapes that collapse/expand ONLY major dims are legal when the lane
  (minor) dim is a multiple of 128 -- so conv GEMMs lane-pad activations
  to 128 before the [TB,H,W,C] -> [M,C] collapse;
* reshapes that move data in/out of the lane dim (flatten-to-lanes) are
  NOT legal -- so ReshapeLayer / FC-flatten become *segment boundaries*
  stitched with free XLA reshapes;
* strided slices are not legal -- stride-s windows are computed as a
  stride-1 sweep over s*OH x s*OW positions, requantized to int8, then
  decimated by a lane-padded 5D reshape + index-0 slice;
* int8 max/min does not legalize -- activations fold into the f32
  saturation bounds of the requant (see ``_requant``).

Numerics are the engine's exact integer recipe (same algebra as
``ops/conv_2d.py`` etc. -- pad-by-zero-point, int8 MXU dots with i32
accumulation, f32 requant with ``roundf`` semantics), so outputs are
bit-identical to the XLA backend.  A trailing Softmax runs OUTSIDE the
fused region: Mosaic's ``exp`` may differ from XLA's by ULPs, and the op
is a negligible [B, N] pass.

Reference parity notes live in the per-op modules this mirrors
(``src/ops/*.rs`` via ``ops/*.py``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..compiler.ir import (
    AveragePool2DLayer,
    Conv2DLayer,
    DepthwiseConv2DLayer,
    FullyConnectedLayer,
    Graph,
    QuantizeLayer,
    ReshapeLayer,
    SoftmaxLayer,
)
from ..core.activation import FusedActivation, quantize_scalar
from ..core.numerics import round_up
from ..core.tensor import ViewGeometry
from . import config

import os

# Per-program working-set budget driving the batch-tile choice.  Mosaic's
# stack allocator keeps ~6x more live than the analytic per-layer estimate
# (transient relayout copies, double buffering, poor reuse across a long
# straight-line program), hence the conservative default (empirically the
# largest that compiles person_detect); MFT_VMEM_BUDGET (bytes) overrides.
_VMEM_BUDGET = int(os.environ.get("MFT_VMEM_BUDGET", 3 * 2**20))


def _requant(q, bias0, c1, act, out_scale, out_zp):
    """roundf(bias0 + c1 * f32(q)) |> saturate+activation, activation
    folded into the f32 clip bounds (int8 max does not legalize)."""
    y = lax.round(bias0 + c1 * q.astype(jnp.float32), lax.RoundingMethod.AWAY_FROM_ZERO)
    lo, hi = -128.0, 127.0
    if act is FusedActivation.RELU:
        lo = float(out_zp)
    elif act is FusedActivation.RELU6:
        lo, hi = float(out_zp), min(127.0, float(quantize_scalar(6.0, out_scale, out_zp)))
    return jnp.clip(y, lo, hi).astype(jnp.int8)


def _lane_pad(x, cp: int, val: int = 0):
    c = x.shape[-1]
    if c == cp:
        return x
    fill = jnp.full(x.shape[:-1] + (cp - c,), np.asarray(val, x.dtype), x.dtype)
    return jnp.concatenate([x, fill], axis=-1)


def _pad_hw(x, top: int, bottom: int, left: int, right: int, pad_val: int):
    """Spatial zero-point padding via concatenation (Mosaic-legal)."""
    tb, h, w, c = x.shape
    fill = lambda shape: jnp.full(shape, np.asarray(pad_val, x.dtype), x.dtype)
    if left or right:
        parts = ([fill((tb, h, left, c))] if left else []) + [x]
        if right:
            parts.append(fill((tb, h, right, c)))
        x = jnp.concatenate(parts, axis=2)
        w += left + right
    if top or bottom:
        parts = ([fill((tb, top, w, c))] if top else []) + [x]
        if bottom:
            parts.append(fill((tb, bottom, w, c)))
        x = jnp.concatenate(parts, axis=1)
    return x


def _pad_for_sweep(x, geom: ViewGeometry, oh1: int, ow1: int, kh: int, kw: int, pad_val: int):
    top, bottom, left, right = geom.pad_amounts()
    bottom += max(0, oh1 + kh - 1 - (x.shape[1] + top + bottom))
    right += max(0, ow1 + kw - 1 - (x.shape[2] + left + right))
    if top == bottom == left == right == 0:
        return x
    return _pad_hw(x, top, bottom, left, right, pad_val)


def _decimate(y, sr: int, sc: int, oh: int, ow: int):
    """int8 [tb, sr*oh, sc*ow, c] -> [tb, oh, ow, c]: keep phase (0, 0).

    W-decimation needs the 5D split reshape, which Mosaic only accepts
    with a 128-multiple lane dim -- lane-pad around it.  H-decimation
    (major-dim split) is always legal.
    """
    tb, h1, w1, c = y.shape
    if sc > 1:
        cp = round_up(c, 128)
        yp = _lane_pad(y, cp)
        y = yp.reshape(tb, h1, ow, sc, cp)[:, :, :, 0, :]
        if cp != c:
            y = y[..., :c]
    if sr > 1:
        y = y.reshape(tb, oh, sr, ow, c)[:, :, 0, :, :]
    return y


def _sweep_extent(g: ViewGeometry):
    oh1 = g.out_rows if g.stride_rows == 1 else g.stride_rows * g.out_rows
    ow1 = g.out_cols if g.stride_cols == 1 else g.stride_cols * g.out_cols
    return oh1, ow1


class _LayerPlan:
    """One fused layer: packed constant arrays + in-kernel apply + a
    per-sample VMEM working-set estimate (drives batch-tile choice)."""

    def __init__(self, consts: list, apply_fn, vmem_per_sample: int,
                 entry_channels: int | None = None):
        self.consts = consts
        self.apply = apply_fn
        self.vmem = vmem_per_sample
        self.entry_channels = entry_channels  # dwconv CH, for XLA-side fallback


def _bcast(row, ndim: int):
    """[1, C] const row -> broadcastable over a rank-``ndim`` value."""
    return row[0][(None,) * (ndim - 1)] if ndim > 2 else row


def _fallback_channels(x, ch: int):
    """Reference channel fallback ``v.get(c).unwrap_or(v[0])``
    (``src/ops/depthwise_conv_2d.rs:103``): out-of-range channels read
    channel 0."""
    in_c = x.shape[-1]
    if in_c == ch:
        return x
    if in_c == 1:
        return jnp.broadcast_to(x, x.shape[:-1] + (ch,))
    idx = [c if c < in_c else 0 for c in range(ch)]
    return jnp.concatenate([x[..., i : i + 1] for i in idx], axis=-1)


def _per_channel(values, n: int, dtype):
    return np.array(
        [values[i] if i < len(values) else values[0] for i in range(n)], dtype
    )


def _plan_dwconv(layer: DepthwiseConv2DLayer, p: dict) -> _LayerPlan:
    g = layer.geom
    KH, KW, CH = layer.weights.shape
    w_zp = _per_channel(layer.w_q.zero_point, CH, np.int32)
    c1 = _per_channel(layer.c1, CH, np.float32)
    in_zp = layer.in_q.zp0
    wc = p["weights"].astype(jnp.int32) - jnp.asarray(w_zp)[None, None, :]
    wc2 = wc.reshape(KH * KW, CH)
    d = -jnp.int32(in_zp) * jnp.sum(wc2, axis=0, keepdims=True)  # [1, CH]
    bias0 = (jnp.float32(layer.out_q.zp0) + p["c0"]).reshape(1, CH)
    consts = [wc2, d, bias0, jnp.asarray(c1).reshape(1, CH)]
    act, osc, ozp = layer.activation, float(layer.out_q.scale0), layer.out_q.zp0
    sr, sc, oh, ow = g.stride_rows, g.stride_cols, g.out_rows, g.out_cols
    oh1, ow1 = _sweep_extent(g)

    def apply(x, wc_v, d_v, b0_v, c1_v):
        x = _fallback_channels(x, CH)
        xp = _pad_for_sweep(x, g, oh1, ow1, KH, KW, in_zp)
        tb = x.shape[0]
        acc = jnp.zeros((tb, oh1, ow1, CH), jnp.int32)
        for m in range(KH):
            for n in range(KW):
                sl = xp[:, m : m + oh1, n : n + ow1, :].astype(jnp.int32)
                acc = acc + sl * _bcast(wc_v[m * KW + n : m * KW + n + 1], 4)
        q = acc + _bcast(d_v, 4)
        y = _requant(q, _bcast(b0_v, 4), _bcast(c1_v, 4), act, osc, ozp)
        return _decimate(y, sr, sc, oh, ow)

    sweep = oh1 * ow1
    vmem = (
        g.in_rows * g.in_cols * CH * 2  # input + padded copy (i8)
        + sweep * CH * 5  # i32 acc + requant i8
        + (sweep * 128 * 2 if sc > 1 and CH % 128 else 0)  # decimation lane-pad
    )
    return _LayerPlan(consts, apply, vmem, entry_channels=CH)


def _plan_conv(layer: Conv2DLayer, p: dict) -> _LayerPlan:
    g = layer.geom
    F, KH, KW, C = layer.filters.shape
    Cp = round_up(C, 128)
    Fp = round_up(F, 128)
    w_zp = _per_channel(layer.w_q.zero_point, F, np.int32)
    c1 = _per_channel(layer.c1, F, np.float32)
    in_zp = layer.in_q.zp0
    has_wzp = bool(np.any(w_zp != 0))
    # im2col-ordered, K-padded weights: tap (m,n) = rows [t*Cp, t*Cp+Cp)
    w_taps = jnp.transpose(p["weights"], (1, 2, 3, 0)).reshape(KH * KW, C, F)  # int8
    if Cp != C:
        w_taps = jnp.concatenate(
            [w_taps, jnp.zeros((KH * KW, Cp - C, F), jnp.int8)], axis=1
        )
    w_packed = w_taps.reshape(KH * KW * Cp, F)
    wsum = jnp.sum(w_packed.astype(jnp.int32), axis=0, keepdims=True)  # [1, F]
    d = jnp.int32(KH * KW * C * in_zp) * jnp.asarray(w_zp)[None, :] - jnp.int32(in_zp) * wsum
    bias0 = (jnp.float32(layer.out_q.zp0) + p["c0"]).reshape(1, F)
    consts = [w_packed, d, bias0, jnp.asarray(c1).reshape(1, F)]
    act, osc, ozp = layer.activation, float(layer.out_q.scale0), layer.out_q.zp0
    sr, sc, oh, ow = g.stride_rows, g.stride_cols, g.out_rows, g.out_cols
    oh1, ow1 = _sweep_extent(g)

    def apply(x, w_v, d_v, b0_v, c1_v):
        tb = x.shape[0]
        xp = _pad_for_sweep(x, g, oh1, ow1, KH, KW, in_zp)
        # lane-pad with 0 so the wzp rowsum correction sees only real lanes
        xpl = _lane_pad(xp, Cp)
        m_rows = tb * oh1 * ow1
        acc = jnp.zeros((m_rows, F), jnp.int32)
        winsum = jnp.zeros((m_rows, 1), jnp.int32) if has_wzp else None
        for m in range(KH):
            for n in range(KW):
                t = m * KW + n
                sl = xpl[:, m : m + oh1, n : n + ow1, :].reshape(m_rows, Cp)
                acc = acc + jnp.dot(
                    sl, w_v[t * Cp : (t + 1) * Cp, :], preferred_element_type=jnp.int32
                )
                if has_wzp:
                    winsum = winsum + jnp.sum(sl.astype(jnp.int32), axis=1, keepdims=True)
        if has_wzp:
            acc = acc - winsum * jnp.asarray(w_zp, jnp.int32)[None, :]
        q = acc + d_v
        y = _requant(q, b0_v, c1_v, act, osc, ozp)  # [M, F] int8
        y = _lane_pad(y, Fp).reshape(tb, oh1, ow1, Fp)
        if Fp != F:
            y = y[..., :F]
        return _decimate(y, sr, sc, oh, ow)

    sweep = oh1 * ow1
    vmem = (
        g.in_rows * g.in_cols * C  # input i8
        + (g.in_rows + KH) * (g.in_cols + KW) * Cp * 2  # lane-padded + collapse copy
        + sweep * (F * 8 + Fp * 2)  # i32 acc + f32 requant + padded i8
    )
    return _LayerPlan(consts, apply, vmem)


def _plan_fc(layer: FullyConnectedLayer, p: dict) -> _LayerPlan:
    K, N = layer.weights.shape
    w_zp = layer.w_q.zp0
    c1 = np.float32(layer.c1)
    c3 = np.int32(layer.c3)
    bias0 = (jnp.float32(layer.out_q.zp0) + p["c0"]).reshape(1, N)
    consts = [p["weights"], p["c2"].reshape(1, N).astype(jnp.int32), bias0]
    act, osc, ozp = layer.activation, float(layer.out_q.scale0), layer.out_q.zp0

    def apply(x, w_v, c2_v, b0_v):
        acc = jnp.dot(x, w_v, preferred_element_type=jnp.int32)
        if w_zp != 0:
            acc = acc - jnp.sum(x.astype(jnp.int32), axis=1, keepdims=True) * jnp.int32(w_zp)
        q = acc - c2_v + c3
        return _requant(q, b0_v, jnp.float32(c1), act, osc, ozp)

    return _LayerPlan(consts, apply, K * 2 + N * 10)


def _plan_quantize(layer) -> _LayerPlan:
    """QUANTIZE: elementwise requant (``ops/quantize_op.py`` math)."""
    in_s, in_zp = float(layer.in_q.scale0), layer.in_q.zp0
    out_s, out_zp = float(layer.out_q.scale0), layer.out_q.zp0

    def apply(x):
        deq = jnp.float32(in_s) * (x.astype(jnp.float32) - jnp.float32(in_zp))
        y = lax.round(deq / jnp.float32(out_s) + jnp.float32(out_zp),
                      lax.RoundingMethod.AWAY_FROM_ZERO)
        return jnp.clip(y, -128.0, 127.0).astype(jnp.int8)

    return _LayerPlan([], apply, 16)


def _plan_avgpool(layer: AveragePool2DLayer) -> _LayerPlan:
    g = layer.geom
    KH, KW = g.k_rows, g.k_cols
    sr, sc, oh, ow = g.stride_rows, g.stride_cols, g.out_rows, g.out_cols
    oh1, ow1 = _sweep_extent(g)
    # static per-pixel reciprocal of valid-count (reference TensorView.len),
    # tiled over the stride-1 sweep grid and pre-broadcast over channels
    # (in-kernel reshapes may not move lanes <-> majors)
    ch = int(layer.out_shape[-1])
    recip = (np.float32(1.0) / g.len_plane().astype(np.float32)).astype(np.float32)
    recip1 = np.repeat(np.repeat(recip, sr, axis=0), sc, axis=1)[:oh1, :ow1]
    recip3 = np.repeat(recip1[:, :, None], ch, axis=2)  # [oh1, ow1, ch]
    consts = [jnp.asarray(recip3)]
    c0, c1 = np.float32(layer.c0), np.float32(layer.c1)
    act, osc, ozp = layer.activation, float(layer.out_q.scale0), layer.out_q.zp0

    def apply(x, recip_v):
        tb, _, _, ch = x.shape
        # avgpool views are TRUE-zero filled (average_pool_2d.rs:82)
        xp = _pad_for_sweep(x, g, oh1, ow1, KH, KW, 0)
        acc = jnp.zeros((tb, oh1, ow1, ch), jnp.int32)
        for m in range(KH):
            for n in range(KW):
                acc = acc + xp[:, m : m + oh1, n : n + ow1, :].astype(jnp.int32)
        mean = recip_v[None, :, :, :] * acc.astype(jnp.float32)
        y = lax.round(c0 * mean + c1, lax.RoundingMethod.AWAY_FROM_ZERO)
        lo, hi = -128.0, 127.0
        if act is FusedActivation.RELU:
            lo = float(ozp)
        elif act is FusedActivation.RELU6:
            lo, hi = float(ozp), min(127.0, float(quantize_scalar(6.0, osc, ozp)))
        y = jnp.clip(y, lo, hi).astype(jnp.int8)
        return _decimate(y, sr, sc, oh, ow)

    vmem = g.in_rows * g.in_cols * 2 + oh1 * ow1 * 9
    return _LayerPlan(consts, apply, vmem * 256)  # ch-agnostic rough bound


def fusable(graph: Graph) -> bool:
    """True when every layer is megakernel-supported and the model is
    int8.  Reshape / FC-flatten layers split the model into segments; a
    trailing softmax runs outside the fused region."""
    if np.dtype(graph.input_dtype) != np.int8:
        return False
    for i, layer in enumerate(graph.layers):
        if isinstance(layer, SoftmaxLayer):
            if i != len(graph.layers) - 1:
                return False
        elif isinstance(layer, QuantizeLayer):
            if np.dtype(layer.out_dtype) != np.int8:
                return False  # kernel pipeline is int8-only
        elif not isinstance(
            layer,
            (Conv2DLayer, DepthwiseConv2DLayer, FullyConnectedLayer,
             AveragePool2DLayer, ReshapeLayer),
        ):
            return False
    return True


def _segment_call(plans: list, in_shape: tuple, out_shape: tuple, xq):
    """Run one segment of consecutive plans as a single pallas_call."""
    B = xq.shape[0]
    per_sample = max(p.vmem for p in plans)
    tb = int(max(1, min(B, _VMEM_BUDGET // max(per_sample, 1), 512)))
    Bp = round_up(B, tb)
    if Bp != B:
        xq = jnp.pad(xq, ((0, Bp - B),) + ((0, 0),) * (xq.ndim - 1))

    n_consts = [len(p.consts) for p in plans]

    def kernel(*refs):
        x = refs[0][:]
        i = 1
        for p, n in zip(plans, n_consts):
            x = p.apply(x, *(r[:] for r in refs[i : i + n]))
            i += n
        refs[-1][:] = x

    const_arrays = [c for p in plans for c in p.consts]
    x_nd = xq.ndim
    in_specs = [
        pl.BlockSpec((tb, *in_shape), lambda i, _nd=x_nd: (i,) + (0,) * (_nd - 1),
                     memory_space=pltpu.VMEM)
    ] + [
        pl.BlockSpec(c.shape, (lambda i, _nd=c.ndim: (0,) * _nd), memory_space=pltpu.VMEM)
        for c in const_arrays
    ]
    out = pl.pallas_call(
        kernel,
        grid=(Bp // tb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (tb, *out_shape),
            lambda i, _nd=len(out_shape): (i,) + (0,) * _nd,
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, *out_shape), jnp.int8),
        interpret=config.interpret(),
    )(xq, *const_arrays)
    return out[:B]


def hybrid_split_index(graph: Graph, min_channels: int = 64) -> int:
    """First layer index from which the fused kernel is lane-efficient:
    the layer's per-sample input has a last dim >= ``min_channels``
    (Mosaic packs the minor dim into 128 lanes; see docs/PERFORMANCE.md).
    Returns len(layers) when no such point exists."""
    shape = tuple(graph.input_shape)
    for i, layer in enumerate(graph.layers):
        if len(shape) >= 1 and shape[-1] >= min_channels and not isinstance(
            layer, SoftmaxLayer
        ):
            return i
        shape = tuple(getattr(layer, "out_shape", shape))
    return len(graph.layers)


def build_fused_forward(graph: Graph, start_index: int = 0):
    """Returns ``forward(params, xq) -> yq``: pallas segments stitched
    with free XLA reshapes; trailing softmax (if any) as a plain XLA op.

    ``start_index`` > 0 gives the *hybrid* mode: layers before it run via
    the XLA backend (lane-hostile small-channel prefix), the rest in the
    fused kernel."""
    layers = list(graph.layers)
    tail_softmax = None
    if layers and isinstance(layers[-1], SoftmaxLayer):
        tail_softmax = layers[-1]
        layers = layers[:-1]
    prefix = [l for l in layers if l.index < start_index]
    layers = [l for l in layers if l.index >= start_index]

    def forward(params, xq):
        if prefix:
            from ..compiler.builder import apply_layer

            for layer in prefix:
                xq = apply_layer(layer, params, xq, "xla")
        # build the plan list lazily (params are traced values)
        steps = []  # ("seg", plans, in_shape, out_shape) | ("reshape", shape)
        shape = tuple(prefix[-1].out_shape) if prefix else tuple(graph.input_shape)
        cur: list = []
        cur_in = shape

        def flush():
            nonlocal cur, cur_in
            if cur:
                # If the segment opens with a depth-multiplier dwconv, the
                # reference channel fallback (gather to CH channels) runs
                # at the XLA level: in-kernel reshapes cannot create a lane
                # dim, and a pre-broadcast input also avoids the extreme
                # HBM tile-padding of a size-1 minor dim.
                pre = None
                first = cur[0]
                if first.entry_channels is not None and first.entry_channels != cur_in[-1]:
                    ch, in_c = first.entry_channels, cur_in[-1]
                    idx = np.array([c if c < in_c else 0 for c in range(ch)])
                    pre = lambda v, _idx=idx: v[..., _idx]
                steps.append(("seg", cur, cur_in, shape, pre))
                cur = []

        for layer in layers:
            key = f"layer{layer.index}"
            if isinstance(layer, ReshapeLayer):
                flush()
                shape = tuple(layer.out_shape)
                steps.append(("reshape", shape))
                cur_in = shape
                continue
            if isinstance(layer, FullyConnectedLayer):
                if layer.flatten_input or len(shape) != 1:
                    flush()
                    shape = (int(np.prod(shape)),)
                    steps.append(("reshape", shape))
                    cur_in = shape
                cur.append(_plan_fc(layer, params[key]))
            elif isinstance(layer, DepthwiseConv2DLayer):
                cur.append(_plan_dwconv(layer, params[key]))
            elif isinstance(layer, Conv2DLayer):
                cur.append(_plan_conv(layer, params[key]))
            elif isinstance(layer, AveragePool2DLayer):
                cur.append(_plan_avgpool(layer))
            elif isinstance(layer, QuantizeLayer):
                cur.append(_plan_quantize(layer))  # int8-only, gated by fusable()
            else:
                raise TypeError(f"megakernel: unsupported layer {type(layer)}")
            shape = tuple(layer.out_shape)
        flush()

        x = xq
        for step in steps:
            if step[0] == "reshape":
                x = x.reshape((x.shape[0], *step[1]))
            else:
                _, plans, in_shape, out_shape, pre = step
                if pre is not None:
                    x = pre(x)
                    in_shape = tuple(x.shape[1:])
                x = _segment_call(plans, in_shape, out_shape, x)

        if tail_softmax is not None:
            from ..core.tensor import reshape_2d
            from ..ops import softmax as softmax_op

            if x.ndim > 2:
                x = reshape_2d(x)
            x = softmax_op(
                x,
                in_scale=tail_softmax.in_q.scale0,
                out_scale=tail_softmax.out_q.scale0,
                out_zp=tail_softmax.out_q.zp0,
            )
        return x

    return forward
