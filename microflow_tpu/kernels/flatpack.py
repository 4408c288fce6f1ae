"""Flat-sample Pallas kernel: batch on sublanes, whole sample on lanes.

Round-2 perf frontier #2 (see docs/PERFORMANCE.md for the postmortem of
the WC-packed guard-row design).  Activations live as 2D int8
``[TB, H*W*C]`` -- one complete sample per sublane row, so

* HBM/VMEM traffic is fully dense (no (32,128) tile padding on C<64
  NHWC tensors, the round-1 bottleneck);
* every conv -- stem (depth-multiplier), dw 3x3 (any stride), pw 1x1 --
  is ONE int8 MXU ``dot_general`` per 128-lane output chunk against a
  planning-time matrix that bakes in taps, strides, SAME-padding edges
  and the channel fallback; strided layers compute only real outputs
  (no decimation passes), and there are no guard rows, rolls, or
  cross-sample effects (samples never share a vector register row);
* the requant epilogue runs only on true output elements, per chunk,
  with ref-sliced constant planes.

Algebra is the engine's exact integer recipe (reference hot loops
``src/ops/depthwise_conv_2d.rs:100-109``, ``conv_2d.rs:92-99``): raw
int8 dot in i32, plus a per-lane constant ``d = -in_zp * colsum(mat)``
(the zp-padding identity of ``core/tensor.py`` restricted to in-bounds
taps), then ``saturate(round_away(bias0 + c1 * f32(acc + d)))`` with
the fused activation folded into the f32 clip bounds.  Bit-identical to
the XLA backend (tests/test_flatpack.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..compiler.ir import Conv2DLayer, DepthwiseConv2DLayer, Graph
from ..core.activation import FusedActivation, quantize_scalar

LANE = 128
MAX_WINDOW = 2048  # K per dot; layers needing more are left to XLA
MAX_LANES = 65536


def _clip_bounds(activation, out_scale, out_zp):
    lo, hi = -128.0, 127.0
    if activation is FusedActivation.RELU:
        lo = float(out_zp)
    elif activation is FusedActivation.RELU6:
        lo = float(out_zp)
        hi = min(127.0, float(quantize_scalar(6.0, out_scale, out_zp)))
    return lo, hi


def _per_channel(vals, n):
    vals = np.atleast_1d(np.asarray(vals))
    return np.array([vals[i] if i < len(vals) else vals[0] for i in range(n)])


@dataclass
class _FlatOp:
    lanes_in: int
    lanes_out: int
    out_shape: tuple  # (h, w, c)
    mats: list = field(default_factory=list)
    # per group: (out_lo, [(window_lo, class_id), ...]) -- adjacent
    # chunks fused into one dot, clustered into one window per run of
    # occupied input chunks; mats[class_id] is [width, 128*g] int8
    groups: list = field(default_factory=list)
    d_plane: np.ndarray | None = None  # i32 [1, lanes_out]
    bias_plane: np.ndarray | None = None  # f32 [1, lanes_out]
    c1_plane: np.ndarray | None = None  # f32 [1, lanes_out]
    clip_lo: float = -128.0
    clip_hi: float = 127.0
    out_zp: int = 0
    # fixed-point epilogue planes (requant="fixed"): p=(acc+db)*m;
    # y = sign(p)*floor(|p|*inv2s + 0.5) + out_zp
    db_plane: np.ndarray | None = None  # f32 [1, lanes_out] = d + bias_q
    m_plane: np.ndarray | None = None  # f32 [1, lanes_out]
    inv2s_plane: np.ndarray | None = None  # f32 [1, lanes_out] = 2**-S


def _layer_taps(layer, in_shape):
    """COO taps (out_lane, in_lane, weight) for a conv/dw layer on the
    flat [H*W*C] index space, SAME-padding edges dropped (their zp
    contribution is restored via d = -in_zp * colsum)."""
    h_in, w_in, c_in = in_shape
    geom = layer.geom
    top, _, left, _ = geom.pad_amounts()
    h_out, w_out = geom.out_rows, geom.out_cols
    if isinstance(layer, DepthwiseConv2DLayer):
        kh, kw, c_out = layer.weights.shape
        o = np.arange(h_out * w_out * c_out)
        h, rem = np.divmod(o, w_out * c_out)
        w, c = np.divmod(rem, c_out)
        # reference channel fallback v.get(c).unwrap_or(v[0])
        ci = np.where(c < c_in, c, 0)
        oo, ii, ww = [], [], []
        for dh in range(kh):
            for dw in range(kw):
                hi = h * geom.stride_rows + dh - top
                wi = w * geom.stride_cols + dw - left
                ok = (hi >= 0) & (hi < h_in) & (wi >= 0) & (wi < w_in)
                oo.append(o[ok])
                ii.append(((hi * w_in + wi) * c_in + ci)[ok])
                ww.append(np.broadcast_to(layer.weights[dh, dw, :], (h_out * w_out, c_out)).reshape(-1)[ok])
        return (np.concatenate(oo), np.concatenate(ii), np.concatenate(ww),
                (h_out, w_out, c_out))
    # Conv2D: filters [F, KH, KW, C]
    f = layer.filters
    c_out, kh, kw, cin_w = f.shape[0], f.shape[1], f.shape[2], f.shape[3]
    if cin_w != c_in:
        return None
    o = np.arange(h_out * w_out * c_out)
    h, rem = np.divmod(o, w_out * c_out)
    w, c = np.divmod(rem, c_out)
    oo, ii, ww = [], [], []
    for dh in range(kh):
        for dw in range(kw):
            hi = h * geom.stride_rows + dh - top
            wi = w * geom.stride_cols + dw - left
            ok = (hi >= 0) & (hi < h_in) & (wi >= 0) & (wi < w_in)
            for ci in range(c_in):
                oo.append(o[ok])
                ii.append(((hi * w_in + wi) * c_in + ci)[ok])
                ww.append(f[c, dh, dw, ci][ok])
    return (np.concatenate(oo), np.concatenate(ii), np.concatenate(ww),
            (h_out, w_out, c_out))


def plan_flat(graph: Graph, max_layers: int | None = None,
              max_window: int = MAX_WINDOW, group_n: int = 512):
    """Plan the maximal flat-packable prefix; None if < 2 layers pack."""
    if np.dtype(graph.input_dtype) != np.int8:
        return None
    if len(graph.input_shape) != 3:
        return None
    in_shape = tuple(graph.input_shape)
    lanes_in0 = int(np.prod(in_shape))
    if lanes_in0 % LANE:
        return None

    ops, n = [], 0
    for idx, layer in enumerate(graph.layers):
        if max_layers is not None and idx >= max_layers:
            break
        if not isinstance(layer, (Conv2DLayer, DepthwiseConv2DLayer)):
            break
        n_ch = (layer.weights.shape[2] if isinstance(layer, DepthwiseConv2DLayer)
                else layer.filters.shape[0])
        if np.any(_per_channel(layer.w_q.zero_point, n_ch) != 0):
            break
        taps = _layer_taps(layer, in_shape)
        if taps is None:
            break
        oo, ii, ww, out_shape = taps
        lanes_in = int(np.prod(in_shape))
        lanes_out = int(np.prod(out_shape))
        if lanes_out % LANE or lanes_out > MAX_LANES:
            break
        op = _FlatOp(lanes_in=lanes_in, lanes_out=lanes_out, out_shape=out_shape)
        order = np.argsort(oo, kind="stable")
        oo, ii, ww = oo[order], ii[order], ww[order]
        chunk_of = oo // LANE
        bounds = np.searchsorted(chunk_of, np.arange(lanes_out // LANE + 1))
        colsum = np.zeros(lanes_out, np.int64)
        np.add.at(colsum, oo, ww.astype(np.int64))
        def clusters(i_any):
            """Gap-based window clustering of tap lanes: contiguous runs
            of occupied 128-chunks (gap >= 1 empty chunk splits -- one
            window for pw, one per kernel row for dw).  Returns aligned
            (lo, hi) windows."""
            ch = np.unique(i_any // LANE)
            splits = np.where(np.diff(ch) > 1)[0]
            out = []
            start = 0
            for sp in list(splits) + [len(ch) - 1]:
                out.append((int(ch[start]) * LANE, (int(ch[sp]) + 1) * LANE))
                start = sp + 1
            return out

        def cl_slots(cl):
            return sum(hi - lo for lo, hi in cl)

        ok = True
        chunk_cl = []  # per chunk: list of aligned windows
        for j in range(lanes_out // LANE):
            s, e = bounds[j], bounds[j + 1]
            if s == e:
                ok = False
                break
            cl = clusters(ii[s:e])
            if max(hi - lo for lo, hi in cl) > max_window:
                ok = False
                break
            chunk_cl.append(cl)
        if not ok:
            break
        # greedy-fuse adjacent chunks into one (multi-window) dot group
        # while the fused clustered windows don't inflate MXU slots
        cls_by_key = {}
        j = 0
        nch = lanes_out // LANE
        while j < nch:
            g = 1
            cl = chunk_cl[j]
            while j + g < nch and g < group_n // LANE:
                s, e = bounds[j], bounds[j + g + 1]
                ncl = clusters(ii[s:e])
                if (max(hi - lo for lo, hi in ncl) > max_window
                        or (cl_slots(ncl) * (g + 1)
                            > 1.05 * (cl_slots(cl) * g + cl_slots(chunk_cl[j + g])))):
                    break
                cl = ncl
                g += 1
            s, e = bounds[j], bounds[j + g]
            o_g, i_g, w_g = oo[s:e], ii[s:e], ww[s:e]
            parts = []
            for lo, hi in cl:
                sel = (i_g >= lo) & (i_g < hi)
                mat = np.zeros((hi - lo, g * LANE), np.int8)
                mat[i_g[sel] - lo, o_g[sel] - j * LANE] = w_g[sel]
                key = (mat.shape, mat.tobytes())
                cid = cls_by_key.get(key)
                if cid is None:
                    cid = len(op.mats)
                    cls_by_key[key] = cid
                    op.mats.append(mat)
                parts.append((int(lo), cid))
            op.groups.append((j * LANE, parts))
            j += g
        in_zp = layer.in_q.zp0
        d = (-np.int64(in_zp) * colsum).astype(np.int64)
        if np.any(d != d.astype(np.int32)):
            break
        op.d_plane = d.astype(np.int32).reshape(1, lanes_out)
        c_out = out_shape[2]
        cidx = np.arange(lanes_out) % c_out
        bias0 = np.float32(layer.out_q.zp0) + layer.c0.astype(np.float32)
        op.bias_plane = bias0[cidx].astype(np.float32).reshape(1, lanes_out)
        op.c1_plane = _per_channel(layer.c1, c_out).astype(np.float32)[cidx].reshape(1, lanes_out)
        op.clip_lo, op.clip_hi = _clip_bounds(
            layer.activation, float(layer.out_q.scale0), layer.out_q.zp0)
        op.out_zp = layer.out_q.zp0
        # fixed-point (M, S) epilogue planes (core/fixedpoint.py's form,
        # folded per lane; d and bias_q combine into one constant)
        from ..core.fixedpoint import quantize_multipliers

        c1_ch = _per_channel(layer.c1, c_out).astype(np.float32)
        m_ch, s_ch = quantize_multipliers(c1_ch)
        bias_q_ch = np.round(layer.c0.astype(np.float32) / c1_ch)
        op.db_plane = (d.astype(np.float32)
                       + bias_q_ch[cidx]).astype(np.float32).reshape(1, lanes_out)
        op.m_plane = m_ch[cidx].astype(np.float32).reshape(1, lanes_out)
        op.inv2s_plane = np.exp2(-s_ch[cidx].astype(np.float32)).reshape(1, lanes_out)
        ops.append(op)
        in_shape = out_shape
        n = idx + 1
    if n < 2:
        return None
    meta = dict(in_lanes=lanes_in0, in_shape=tuple(graph.input_shape),
                out_shape=ops[-1].out_shape, out_lanes=ops[-1].lanes_out)
    return ops, n, meta


def build_flat_kernel(graph: Graph, tb: int = 256, interpret: bool = False,
                      max_layers: int | None = None,
                      max_window: int = MAX_WINDOW, group_n: int = 512,
                      requant: str = "exact"):
    """Compile the flat prefix into a pallas_call.

    requant="exact" (default) keeps the engine's bit-exact f32 recipe;
    "fixed" uses the integer (M, S) epilogue of core/fixedpoint.py
    inside the hot kernel (<=1 output LSB vs exact; ~2x the VPU ops on
    TPU, so it exists for integer-runtime parity, not speed -- measured
    in docs/PERFORMANCE.md).

    Returns (flat_fn, n_layers, meta): flat_fn(xq[B, in_lanes] int8) ->
    int8 [B, out_lanes], or None if not packable.
    """
    plan = plan_flat(graph, max_layers=max_layers, max_window=max_window,
                     group_n=group_n)
    if plan is None:
        return None
    ops, n_layers, meta = plan

    consts = []

    def add_const(arr):
        consts.append(jnp.asarray(arr))
        return len(consts) - 1

    for op in ops:
        op._m_idx = [add_const(m) for m in op.mats]
        if requant == "fixed":
            op._db_idx = add_const(op.db_plane)
            op._fm_idx = add_const(op.m_plane)
            op._is_idx = add_const(op.inv2s_plane)
        else:
            op._d_idx = add_const(op.d_plane)
            op._b_idx = add_const(op.bias_plane)
            op._c_idx = add_const(op.c1_plane)

    in_lanes, out_lanes = meta["in_lanes"], meta["out_lanes"]
    scratch_lanes = max(op.lanes_out for op in ops[:-1]) if len(ops) > 1 else LANE

    def kernel(x_ref, *refs):
        # ref order: const inputs, then outputs, then scratch
        crefs = refs[: len(consts)]
        out_ref = refs[len(consts)]
        s0, s1 = refs[len(consts) + 1], refs[len(consts) + 2]
        src = x_ref
        for li, op in enumerate(ops):
            dst = out_ref if li == len(ops) - 1 else (s0 if li % 2 == 0 else s1)
            if requant == "fixed":
                dbref = crefs[op._db_idx]
                fmref = crefs[op._fm_idx]
                isref = crefs[op._is_idx]
            else:
                dref = crefs[op._d_idx]
                bref = crefs[op._b_idx]
                cref = crefs[op._c_idx]
            def emit_dots(out_lo, parts):
                acc = None
                ncols = None
                for lo, cid in parts:
                    mat = crefs[op._m_idx[cid]]
                    ncols = mat.shape[1]
                    win = src[:, lo : lo + mat.shape[0]]
                    a = lax.dot_general(win, mat[:], (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.int32)
                    acc = a if acc is None else acc + a
                return out_lo, ncols, acc

            def emit_requant(out_lo, ncols, acc):
                if requant == "fixed":
                    # integer (M, S) epilogue (core/fixedpoint.py):
                    # y = sign(p)*floor(|p|*2**-S + 0.5) + out_zp
                    p = ((acc.astype(jnp.float32)
                          + dbref[0:1, out_lo : out_lo + ncols])
                         * fmref[0:1, out_lo : out_lo + ncols])
                    mag = jnp.floor(
                        jnp.abs(p) * isref[0:1, out_lo : out_lo + ncols] + 0.5)
                    y = jnp.sign(p) * mag + np.float32(op.out_zp)
                    y = jnp.clip(y, op.clip_lo, op.clip_hi)
                    dst[:, out_lo : out_lo + ncols] = y.astype(jnp.int8)
                    return
                q = acc + dref[0:1, out_lo : out_lo + ncols]
                y = (bref[0:1, out_lo : out_lo + ncols]
                     + cref[0:1, out_lo : out_lo + ncols] * q.astype(jnp.float32))
                y = lax.round(y, lax.RoundingMethod.AWAY_FROM_ZERO)
                if op.clip_lo > -128.0 or op.clip_hi < 127.0:
                    y = jnp.clip(y, op.clip_lo, op.clip_hi)
                # else: the f32->int8 cast saturates in hardware (probed)
                dst[:, out_lo : out_lo + ncols] = y.astype(jnp.int8)

            # software-pipeline: group g+1's MXU dots are emitted before
            # group g's VPU requant so the two units can dual-issue
            pending = None
            for out_lo, parts in op.groups:
                ready = emit_dots(out_lo, parts)
                if pending is not None:
                    emit_requant(*pending)
                pending = ready
            emit_requant(*pending)
            src = dst

    def flat_fn(xq):
        b = xq.shape[0]
        if b % tb:
            raise ValueError(f"batch {b} not divisible by flat tile {tb}")
        in_specs = [pl.BlockSpec((tb, in_lanes), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)]
        for carr in consts:
            zeros = (0,) * carr.ndim
            in_specs.append(pl.BlockSpec(carr.shape, lambda i, z=zeros: z,
                                         memory_space=pltpu.VMEM))
        return pl.pallas_call(
            kernel,
            grid=(b // tb,),
            out_shape=jax.ShapeDtypeStruct((b, out_lanes), jnp.int8),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((tb, out_lanes), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((tb, scratch_lanes), jnp.int8),
                            pltpu.VMEM((tb, scratch_lanes), jnp.int8)],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
            interpret=interpret,
        )(xq, *consts)

    return flat_fn, n_layers, meta
