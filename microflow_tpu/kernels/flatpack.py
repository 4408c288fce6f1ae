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

Round-3 additions:

* **Phase offsets**: every intermediate tensor gets a planning-time
  lane offset in its padded flat buffer, chosen per edge (greedy, true
  slot-cost argmin) so dw windows land on 128-lane chunk boundaries.
  Without an offset a stride-1 dw window ``[(w-1)*C, (w+2)*C)`` starts
  ``C`` lanes before a chunk edge and snaps to 3 chunks (K=384/row);
  with ``in_off - out_off = C (mod 128)`` it spans exactly
  ``ceil((128+2C)/128)`` chunks (K=256/row for C<=64) -- a ~25-30%
  MXU-slot cut on the C in {8..64} dw layers.
* **VPU tap ops**: stride-1 dw layers whose tap shifts are multiples of
  128 lanes (C % 128 == 0, offsets 0) skip the MXU entirely: each of
  the 9 taps is an aligned lane-slice multiply-accumulate against a
  per-lane weight plane (edge-masked), an exact integer reformulation
  with ~50x fewer MXU-slot-equivalents than the dense-dot form.

Algebra is the engine's exact integer recipe (reference hot loops
``src/ops/depthwise_conv_2d.rs:100-109``, ``conv_2d.rs:92-99``): raw
int8 dot in i32, plus a per-lane constant ``d = -in_zp * colsum(mat)``
(the zp-padding identity of ``core/tensor.py`` restricted to in-bounds
taps), then ``saturate(round_away(bias0 + c1 * f32(acc + d)))`` with
the fused activation folded into the f32 clip bounds.  Bit-identical to
the XLA backend (tests/test_flatpack.py).
"""

from __future__ import annotations

import math
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
    kind: str  # "conv" (MXU dot groups) | "taps" (VPU shift-MACs) | "softmax"
    lanes_in: int  # logical
    lanes_out: int  # logical
    in_off: int
    out_off: int
    lanes_in_p: int  # padded (multiple of LANE)
    lanes_out_p: int
    out_shape: tuple  # (h, w, c) logical
    mats: list = field(default_factory=list)
    # per group: (out_lo, [(window_lo, class_id), ...]) -- adjacent
    # chunks fused into one dot, clustered into one window per run of
    # occupied input chunks; mats[class_id] is [width, 128*g] int8
    groups: list = field(default_factory=list)
    # taps-op payload: [(shift_lanes, out_lo, out_hi)]; the per-lane
    # weight plane w_plane[tap] is an i32 [1, lanes_out_p] constant with
    # edge-invalid lanes zeroed
    taps: list = field(default_factory=list)
    tap_planes: list = field(default_factory=list)
    tap_ranges: list = field(default_factory=list)  # aligned (lo, hi) out ranges
    # epilogue: "conv" = saturate(round_away(bias + c1*f32(acc+d)));
    # "pool" = saturate(round_away(c1 * (recip*f32(acc)) + bias))
    # (pool maps C0 -> c1_plane, C1 -> bias_plane, 1/len -> r_plane)
    epi: str = "conv"
    d_plane: np.ndarray | None = None  # i32 [1, lanes_out_p]
    bias_plane: np.ndarray | None = None  # f32 [1, lanes_out_p]
    c1_plane: np.ndarray | None = None  # f32 [1, lanes_out_p]
    r_plane: np.ndarray | None = None  # f32 [1, lanes_out_p] (pool recip)
    # softmax params: masked exp over the real lanes of one chunk
    sm_mask: np.ndarray | None = None  # f32 [1, LANE]
    sm_in_scale: float = 0.0
    sm_out_scale: float = 0.0
    clip_lo: float = -128.0
    clip_hi: float = 127.0
    out_zp: int = 0
    layer_idx: int = -1  # graph.layers index this op implements
    # fixed-point epilogue planes (requant="fixed"):
    # y = round_away((acc + db) * (M * 2**-S)) + out_zp.  db = d + bias_q
    # is integer-valued and added in i32 (like exact2's d); M*2**-S is
    # ONE f32 plane -- the power-of-2 scale folds into M exactly (m has
    # <= 15 mantissa bits), so the product rounds once, bit-identical to
    # the two-plane (m, inv2s) form this replaced (round-5 task 8: the
    # fold + i32 pre-add + trunc-cast round cut the chain from ~12 to ~8
    # VPU passes)
    db_plane: np.ndarray | None = None  # i32 [1, lanes_out_p] = d + bias_q
    m_plane: np.ndarray | None = None  # f32 [1, lanes_out_p] = M * 2**-S

    def slots(self) -> int:
        """MXU slot-products per sample (see scripts/flat_stats.py)."""
        total = 0
        for _, parts in self.groups:
            n = self.mats[parts[0][1]].shape[1]
            total += sum(self.mats[cid].shape[0] for _, cid in parts) * n
        return total


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


def _fc_taps(layer, in_shape):
    """COO taps (out_lane, in_lane, weight) for FullyConnected (reference
    R6, ``src/ops/fully_connected.rs``) on the flat index space: the
    sample is already a flat lane vector, so FC is one dense dot.  With
    w_zp == 0 the reference's 4-term decomposition collapses to
    ``q = acc - C2`` and C2 = in_zp * colsum(W) is exactly the generic
    ``d = -in_zp * colsum`` plane the conv epilogue already computes
    from these taps (C3 = K * in_zp * w_zp = 0)."""
    k, n = layer.weights.shape
    if int(np.prod(in_shape)) != k:
        return None
    oo = np.tile(np.arange(n), k)
    ii = np.repeat(np.arange(k), n)
    ww = layer.weights.reshape(-1)
    return oo, ii, ww, (n,)


def _cluster_and_group(oo_p, ii_p, ww, lanes_out_p, max_window, group_n,
                       fuse_slack=1.05):
    """Window-cluster + greedy-fuse one layer's (padded-index) taps.

    Returns (groups, mats, slots).  Windows wider than ``max_window``
    are split into aligned <=``max_window`` pieces -- the group's parts
    sum in the same i32 accumulator, so splitting is exact (this is how
    wide-K layers like a 4000-input FullyConnected ride the same dot
    machinery).  Chunks with no taps (dead padding lanes) emit no
    group; their requant planes are zero and downstream matrices never
    reference them."""
    order = np.argsort(oo_p, kind="stable")
    oo_p, ii_p, ww = oo_p[order], ii_p[order], ww[order]
    nch = lanes_out_p // LANE
    chunk_of = oo_p // LANE
    bounds = np.searchsorted(chunk_of, np.arange(nch + 1))

    def clusters(i_any):
        """Gap-based window clustering of tap lanes: contiguous runs
        of occupied 128-chunks (gap >= 1 empty chunk splits -- one
        window for pw, one per kernel row for dw), each run split into
        aligned <= max_window pieces.  Returns aligned (lo, hi)."""
        ch = np.unique(i_any // LANE)
        splits = np.where(np.diff(ch) > 1)[0]
        out = []
        start = 0
        for sp in list(splits) + [len(ch) - 1]:
            lo, hi = int(ch[start]) * LANE, (int(ch[sp]) + 1) * LANE
            while hi - lo > max_window:
                out.append((lo, lo + max_window))
                lo += max_window
            out.append((lo, hi))
            start = sp + 1
        return out

    def cl_slots(cl):
        return sum(hi - lo for lo, hi in cl)

    chunk_cl = []  # per chunk: list of aligned windows (None = dead chunk)
    for j in range(nch):
        s, e = bounds[j], bounds[j + 1]
        if s == e:
            chunk_cl.append(None)
            continue
        chunk_cl.append(clusters(ii_p[s:e]))

    # greedy-fuse adjacent chunks into one (multi-window) dot group
    # while the fused clustered windows don't inflate MXU slots
    groups, mats = [], []
    cls_by_key = {}
    slots = 0
    j = 0
    while j < nch:
        if chunk_cl[j] is None:
            j += 1
            continue
        g = 1
        cl = chunk_cl[j]
        while j + g < nch and g < group_n // LANE and chunk_cl[j + g] is not None:
            s, e = bounds[j], bounds[j + g + 1]
            ncl = clusters(ii_p[s:e])
            if (cl_slots(ncl) * (g + 1)
                    > fuse_slack * (cl_slots(cl) * g + cl_slots(chunk_cl[j + g]))):
                break
            cl = ncl
            g += 1
        s, e = bounds[j], bounds[j + g]
        o_g, i_g, w_g = oo_p[s:e], ii_p[s:e], ww[s:e]
        parts = []
        for lo, hi in cl:
            sel = (i_g >= lo) & (i_g < hi)
            mat = np.zeros((hi - lo, g * LANE), np.int8)
            mat[i_g[sel] - lo, o_g[sel] - j * LANE] = w_g[sel]
            key = (mat.shape, mat.tobytes())
            cid = cls_by_key.get(key)
            if cid is None:
                cid = len(mats)
                cls_by_key[key] = cid
                mats.append(mat)
            parts.append((int(lo), cid))
            slots += mat.shape[0] * mat.shape[1]
        groups.append((j * LANE, parts))
        j += g
    return groups, mats, slots


def _offset_candidates(c_out: int) -> list:
    """Output-edge offset candidates: the distinct multiples of
    gcd(c_out, 128) mod 128 (window phases repeat with this period),
    capped at 16 values."""
    g = math.gcd(c_out, 128)
    if 128 // g > 16:
        g = 8
    return list(range(0, 128, g))


def _search_cost(oo, ii, out_off, in_off) -> int:
    """Fast slot cost of a layer at given edge offsets, g=1 grouping.

    Window clustering merges runs of CONSECUTIVE occupied input chunks,
    so each out chunk's summed window height is 128 * (#occupied input
    chunks) -- total slots = 128*128*|{(out_chunk, in_chunk)}|."""
    key = (((oo + out_off) // LANE).astype(np.int64) << 32) | ((ii + in_off) // LANE)
    return LANE * LANE * int(np.unique(key).size)


def _dw_aligned_cands(layer, in_shape, in_off) -> list:
    """Analytic chunk-aligning out offsets for a dw layer: the window
    start for out chunk j is in_off + st*(128j - out_off) - left*C
    (mod 128), so alignment needs st*out_off = in_off - left*C."""
    if not isinstance(layer, DepthwiseConv2DLayer):
        return []
    geom = layer.geom
    c = in_shape[2]
    _, _, left, _ = geom.pad_amounts()
    st = geom.stride_cols
    rhs = (in_off - left * c) % 128
    if st == 1:
        return [rhs]
    if st == 2 and rhs % 2 == 0:
        return [rhs // 2, rhs // 2 + 64]
    return []


def _taps_applicable(layer, in_shape, out_shape) -> bool:
    if not isinstance(layer, DepthwiseConv2DLayer):
        return False
    geom = layer.geom
    h_in, w_in, c_in = in_shape
    h_out, w_out, c_out = out_shape
    return (geom.stride_rows == 1 and geom.stride_cols == 1
            and c_out == c_in and c_out % LANE == 0
            and (h_in, w_in) == (h_out, w_out))


# nominal MXU-slot-equivalent cost per output lane of a VPU tap op (9
# tap mul-adds ~ a few hundred slot-times); only needs to rank below
# the ~900-slot/lane dense-dot alternative it replaces
TAPS_COST_PER_LANE = 160


def _try_taps(layer, in_shape, out_shape, in_off, out_off, lanes_in_p):
    """VPU tap formulation for stride-1 dw with chunk-aligned tap
    shifts: each tap is src[:, lo+shift : hi+shift] * w_plane -- exact
    same integer accumulator as the dense-dot form, zero MXU slots.
    Returns (taps, planes, ranges) or None."""
    if not isinstance(layer, DepthwiseConv2DLayer):
        return None
    geom = layer.geom
    h_in, w_in, c_in = in_shape
    h_out, w_out, c_out = out_shape
    if (geom.stride_rows != 1 or geom.stride_cols != 1 or c_out != c_in
            or c_out % LANE or in_off != out_off
            or (h_in, w_in) != (h_out, w_out)):
        return None
    top, _, left, _ = geom.pad_amounts()
    kh, kw = geom.k_rows, geom.k_cols
    lanes_out = h_out * w_out * c_out
    lanes_out_p = -(-(lanes_out + out_off) // LANE) * LANE
    o = np.arange(lanes_out)
    h, rem = np.divmod(o, w_out * c_out)
    w, c = np.divmod(rem, c_out)
    taps, planes, ranges = [], [], []
    for dh in range(kh):
        for dw in range(kw):
            shift = ((dh - top) * w_in + (dw - left)) * c_in
            if shift % LANE:
                return None
            hi_ = h + dh - top
            wi_ = w + dw - left
            ok = (hi_ >= 0) & (hi_ < h_in) & (wi_ >= 0) & (wi_ < w_in)
            plane = np.zeros(lanes_out_p, np.int32)
            plane[out_off + o[ok]] = layer.weights[dh, dw, :][c[ok]]
            # aligned out range whose src slice stays in-bounds
            lo = max(0, -shift)
            hi = min(lanes_out_p, lanes_in_p - shift)
            lo = (lo // LANE) * LANE
            hi = (hi // LANE) * LANE
            if np.any(plane[:lo] != 0) or np.any(plane[hi:] != 0):
                return None  # a valid tap falls outside the safe range
            if lo >= hi:
                continue
            taps.append(shift)
            planes.append(plane.reshape(1, lanes_out_p))
            ranges.append((lo, hi))
    return taps, planes, ranges


def _pool_taps(layer, in_shape):
    """COO taps (out_lane, in_lane, 1) for AveragePool2D: the plain
    in-bounds view sum (reference zero-fills OOB and divides by the
    in-bounds count -- ``src/ops/average_pool_2d.rs:82-95``)."""
    h_in, w_in, c = in_shape
    geom = layer.geom
    top, _, left, _ = geom.pad_amounts()
    h_out, w_out = geom.out_rows, geom.out_cols
    o = np.arange(h_out * w_out * c)
    h, rem = np.divmod(o, w_out * c)
    w, ch = np.divmod(rem, c)
    oo, ii = [], []
    for dh in range(geom.k_rows):
        for dw in range(geom.k_cols):
            hi = h * geom.stride_rows + dh - top
            wi = w * geom.stride_cols + dw - left
            ok = (hi >= 0) & (hi < h_in) & (wi >= 0) & (wi < w_in)
            oo.append(o[ok])
            ii.append(((hi * w_in + wi) * c + ch)[ok])
    oo, ii = np.concatenate(oo), np.concatenate(ii)
    return oo, ii, np.ones(len(oo), np.int8), (h_out, w_out, c)


def _pack_prefix(graph: Graph, max_layers):
    """Walk the packable layer chain: the conv/dw/fc compute ops plus
    (when it reaches them) the AveragePool2D / Reshape / Softmax tail.
    Returns [(kind, layer, in_shape, out_shape, oo, ii, ww)]."""
    from ..compiler.ir import (AveragePool2DLayer, FullyConnectedLayer,
                               ReshapeLayer, SoftmaxLayer)

    if np.dtype(graph.input_dtype) != np.int8:
        return None
    in_shape = tuple(graph.input_shape)
    layers = []
    n_convs = 0
    for idx, layer in enumerate(graph.layers):
        if max_layers is not None and idx >= max_layers:
            break
        if isinstance(layer, (Conv2DLayer, DepthwiseConv2DLayer)):
            n_ch = (layer.weights.shape[2]
                    if isinstance(layer, DepthwiseConv2DLayer)
                    else layer.filters.shape[0])
            if np.any(_per_channel(layer.w_q.zero_point, n_ch) != 0):
                break
            if len(in_shape) != 3:
                break
            taps = _layer_taps(layer, in_shape)
            if taps is None:
                break
            oo, ii, ww, out_shape = taps
            if int(np.prod(out_shape)) > MAX_LANES:
                break
            layers.append(("conv", layer, in_shape, out_shape, oo, ii, ww))
            n_convs += 1
        elif isinstance(layer, FullyConnectedLayer):
            # the 4-term decomposition only collapses to the generic
            # d-plane when w_zp == 0 (see _fc_taps)
            if np.any(np.atleast_1d(layer.w_q.zero_point) != 0):
                break
            taps = _fc_taps(layer, in_shape)
            if taps is None:
                break
            oo, ii, ww, out_shape = taps
            layers.append(("conv", layer, in_shape, out_shape, oo, ii, ww))
            n_convs += 1
        elif isinstance(layer, AveragePool2DLayer) and len(in_shape) == 3:
            oo, ii, ww, out_shape = _pool_taps(layer, in_shape)
            layers.append(("pool", layer, in_shape, out_shape, oo, ii, ww))
        elif isinstance(layer, ReshapeLayer):
            out_shape = tuple(layer.out_shape)
            if int(np.prod(out_shape)) != int(np.prod(in_shape)):
                break
            layers.append(("skip", layer, in_shape, out_shape, None, None, None))
        elif isinstance(layer, SoftmaxLayer):
            n = int(np.prod(in_shape))
            if n > LANE:
                break
            layers.append(("softmax", layer, in_shape, tuple(layer.out_shape),
                           None, None, None))
        else:
            break
        in_shape = layers[-1][3]
    # drop a trailing tail that never reached a compute op
    while layers and layers[-1][0] == "skip":
        layers.pop()
    return layers if n_convs >= 2 else None


def _search_offsets(packed, use_offsets, use_taps, beam=4):
    """Beam-search (width ``beam``) the per-edge lane offsets that
    minimize total MXU slots, with VPU tap ops at their nominal cost.
    Returns the chosen offset chain [off_0, ..., off_n] (edge i is the
    input of layer i)."""
    # states: in_off -> (cum_cost, path)
    states = {0: (0, (0,))}
    for kind, layer, in_shape, out_shape, oo, ii, ww in packed:
        if kind in ("skip", "softmax"):
            # pass-through / lane-local op: offset carries over
            states = {off: (cum, path + (off,))
                      for off, (cum, path) in states.items()}
            continue
        c_out = out_shape[-1]
        lanes_out = int(np.prod(out_shape))
        cands = _offset_candidates(c_out) if use_offsets else [0]
        taps_ok = (kind == "conv" and use_taps
                   and _taps_applicable(layer, in_shape, out_shape))
        nxt = {}
        for in_off, (cum, path) in states.items():
            extra = (_dw_aligned_cands(layer, in_shape, in_off)
                     if use_offsets and kind == "conv" else [])
            for out_off in dict.fromkeys(cands + extra):
                if lanes_out + out_off > MAX_LANES:
                    continue
                cost = _search_cost(oo, ii, out_off, in_off)
                if taps_ok and out_off == in_off:
                    cost = min(cost, TAPS_COST_PER_LANE * lanes_out)
                total = cum + cost
                if out_off not in nxt or total < nxt[out_off][0]:
                    nxt[out_off] = (total, path + (out_off,))
        if not nxt:
            return None
        states = dict(sorted(nxt.items(), key=lambda kv: kv[1][0])[:beam])
    best = min(states.values(), key=lambda v: v[0])
    return list(best[1])


def plan_flat(graph: Graph, max_layers: int | None = None,
              max_window: int = MAX_WINDOW, group_n: int = 512,
              use_offsets: bool = True, use_taps: bool = True,
              fuse_slack: float = 1.05):
    """Plan the maximal flat-packable prefix; None if < 2 layers pack."""
    packed = _pack_prefix(graph, max_layers)
    if packed is None:
        return None
    offs = _search_offsets(packed, use_offsets, use_taps)
    if offs is None:
        return None

    lanes_in0 = int(np.prod(packed[0][2]))
    ops, n = [], 0
    cur_off = offs[0]
    cur_lanes_p = -(-(lanes_in0 + cur_off) // LANE) * LANE
    for idx, (kind, layer, in_shape, out_shape, oo, ii, ww) in enumerate(packed):
        lanes_in = int(np.prod(in_shape))
        lanes_out = int(np.prod(out_shape))
        out_off = offs[idx + 1]
        lanes_out_p = -(-(lanes_out + out_off) // LANE) * LANE

        if kind == "skip":
            # pure reshape: the flat buffer is unchanged.  n is NOT
            # advanced here -- the next planned compute op's n = idx+1
            # subsumes the reshape, and if planning breaks first the
            # reshape stays in the XLA suffix (otherwise the suffix
            # would see the pre-reshape out_shape)
            continue
        if kind == "softmax":
            if cur_off + lanes_in > LANE:
                break
            op = _FlatOp(kind="softmax", lanes_in=lanes_in, lanes_out=lanes_in,
                         in_off=cur_off, out_off=cur_off,
                         lanes_in_p=cur_lanes_p, lanes_out_p=LANE,
                         out_shape=out_shape)
            mask = np.zeros(LANE, np.float32)
            mask[cur_off : cur_off + lanes_in] = 1.0
            op.sm_mask = mask.reshape(1, LANE)
            op.sm_in_scale = float(layer.in_q.scale0)
            op.sm_out_scale = float(layer.out_q.scale0)
            op.out_zp = layer.out_q.zp0
            op.layer_idx = idx
            ops.append(op)
            cur_lanes_p = LANE
            n = idx + 1
            continue

        c_out = out_shape[-1]
        ii_p = ii + cur_off

        # VPU tap formulation (C % 128 == 0 stride-1 dw): zero MXU
        # slots, aligned lane-slice MACs
        tap_plan = (_try_taps(layer, in_shape, out_shape, cur_off, out_off,
                              cur_lanes_p)
                    if kind == "conv" and use_taps and out_off == cur_off
                    else None)
        if tap_plan is not None:
            op = _FlatOp(kind="taps", lanes_in=lanes_in, lanes_out=lanes_out,
                         in_off=cur_off, out_off=out_off,
                         lanes_in_p=cur_lanes_p, lanes_out_p=lanes_out_p,
                         out_shape=out_shape)
            op.taps, op.tap_planes, op.tap_ranges = tap_plan
        else:
            r = _cluster_and_group(oo + out_off, ii_p, ww, lanes_out_p,
                                   max_window, group_n, fuse_slack)
            if r is None:
                break
            groups, mats, _slots = r
            op = _FlatOp(kind="conv", lanes_in=lanes_in, lanes_out=lanes_out,
                         in_off=cur_off, out_off=out_off,
                         lanes_in_p=cur_lanes_p, lanes_out_p=lanes_out_p,
                         out_shape=out_shape)
            op.groups, op.mats = groups, mats

        def pad_plane(vals, dtype):
            p = np.zeros(op.lanes_out_p, dtype)
            p[op.out_off : op.out_off + lanes_out] = vals
            return p.reshape(1, op.lanes_out_p)

        op.clip_lo, op.clip_hi = _clip_bounds(
            layer.activation, float(layer.out_q.scale0), layer.out_q.zp0)
        op.out_zp = layer.out_q.zp0
        if kind == "pool":
            # reference R9: y = roundf(C0 * ((1/len) * f32(sum)) + C1)
            op.epi = "pool"
            h_out, w_out, c = out_shape
            recip = (np.float32(1.0)
                     / layer.geom.len_plane().astype(np.float32))
            op.r_plane = pad_plane(
                np.repeat(recip.reshape(-1), c).astype(np.float32), np.float32)
            op.c1_plane = pad_plane(
                np.full(lanes_out, layer.c0, np.float32), np.float32)
            op.bias_plane = pad_plane(
                np.full(lanes_out, layer.c1, np.float32), np.float32)
            op.layer_idx = idx
            ops.append(op)
            cur_off = op.out_off
            cur_lanes_p = op.lanes_out_p
            n = idx + 1
            continue

        colsum = np.zeros(lanes_out, np.int64)
        np.add.at(colsum, oo, ww.astype(np.int64))
        in_zp = layer.in_q.zp0
        d = (-np.int64(in_zp) * colsum).astype(np.int64)
        if np.any(d != d.astype(np.int32)):
            break

        op.d_plane = pad_plane(d.astype(np.int32), np.int32)
        cidx = np.arange(lanes_out) % c_out
        bias0 = np.float32(layer.out_q.zp0) + layer.c0.astype(np.float32)
        op.bias_plane = pad_plane(bias0[cidx].astype(np.float32), np.float32)
        op.c1_plane = pad_plane(
            _per_channel(layer.c1, c_out).astype(np.float32)[cidx], np.float32)
        # fixed-point (M, S) epilogue planes (core/fixedpoint.py's form,
        # folded per lane; d and bias_q combine into one constant)
        from ..core.fixedpoint import quantize_multipliers

        c1_ch = _per_channel(layer.c1, c_out).astype(np.float32)
        m_ch, s_ch = quantize_multipliers(c1_ch)
        bias_q_ch = np.round(layer.c0.astype(np.float32) / c1_ch)
        db = d.astype(np.float64) + bias_q_ch[cidx].astype(np.float64)
        if np.all(np.abs(db) < 2**31):
            op.db_plane = pad_plane(db.astype(np.int32), np.int32)
            op.m_plane = pad_plane(
                (m_ch.astype(np.float64) * np.exp2(-s_ch.astype(np.float64)))
                [cidx].astype(np.float32), np.float32)
        # else: db overflows i32 -- leave the fixed planes unset; the
        # builder rejects requant="fixed" for this graph (never seen on
        # real converter output, where |d + bias_q| < 2**24)
        op.layer_idx = idx
        ops.append(op)
        cur_off = op.out_off
        cur_lanes_p = op.lanes_out_p
        n = idx + 1
    if n < 2:
        return None
    # the prefix must end on an emitted op (its out_shape is the
    # contract the XLA suffix resumes from)
    assert ops[-1].layer_idx == n - 1, (ops[-1].layer_idx, n)
    meta = dict(in_lanes=lanes_in0, in_shape=tuple(graph.input_shape),
                in_off=ops[0].in_off, in_lanes_p=ops[0].lanes_in_p,
                out_shape=ops[-1].out_shape, out_lanes=ops[-1].lanes_out,
                out_off=ops[-1].out_off, out_lanes_p=ops[-1].lanes_out_p)
    return ops, n, meta


def build_flat_kernel(graph: Graph, tb: int = 256, interpret: bool = False,
                      max_layers: int | None = None,
                      max_window: int = MAX_WINDOW, group_n: int = 512,
                      requant: str = "exact2", use_offsets: bool = True,
                      use_taps: bool = True, depth: int = 1,
                      fuse_slack: float = 1.05):
    """Compile the flat prefix into a pallas_call.

    requant modes (per-element epilogue; measured costs in
    docs/PERFORMANCE.md "Round 3"):

    * "exact2" (default) -- bit-exact f32 recipe with round-away folded
      into the truncating saturating f32->int8 cast via
      trunc(y + copysign(0.5, y)) (cast semantics probed on v5e,
      scripts/probe_cast.py); ~1.1 ms/batch cheaper than "exact".
    * "exact" -- the same algebra through lax.round(AWAY_FROM_ZERO);
      kept as the straight-line transcription of the reference recipe.
    * "fixed" -- the integer (M, S) epilogue of core/fixedpoint.py
      (<=2 output LSB vs exact; +17% runtime -- exists for
      integer-runtime parity, not speed).
    * "raw" / "noround" -- measurement-only (NOT bit-exact) epilogues
      used to attribute MXU vs VPU cost in situ.

    Returns (flat_fn, n_layers, meta): flat_fn(xq[B, in_lanes] int8) ->
    int8 [B, out_lanes_p] (slice [out_off : out_off+out_lanes]), or
    None if not packable.
    """
    plan = plan_flat(graph, max_layers=max_layers, max_window=max_window,
                     group_n=group_n, use_offsets=use_offsets,
                     use_taps=use_taps, fuse_slack=fuse_slack)
    if plan is None:
        return None
    ops, n_layers, meta = plan

    consts = []

    def add_const(arr):
        consts.append(jnp.asarray(arr))
        return len(consts) - 1

    for op in ops:
        op._m_idx = [add_const(m) for m in op.mats]
        op._t_idx = [add_const(p) for p in op.tap_planes]
        if op.kind == "softmax":
            op._sm_idx = add_const(op.sm_mask)
            continue
        if op.epi == "pool":
            op._r_idx = add_const(op.r_plane)
            op._b_idx = add_const(op.bias_plane)
            op._c_idx = add_const(op.c1_plane)
        elif requant == "fixed":
            if op.db_plane is None:
                return None  # db overflowed i32 at planning (see plan_flat)
            op._db_idx = add_const(op.db_plane)
            op._fm_idx = add_const(op.m_plane)
        else:
            op._d_idx = add_const(op.d_plane)
            op._b_idx = add_const(op.bias_plane)
            op._c_idx = add_const(op.c1_plane)

    in_lanes_p, out_lanes_p = meta["in_lanes_p"], meta["out_lanes_p"]
    scratch_lanes = (max(op.lanes_out_p for op in ops[:-1])
                     if len(ops) > 1 else LANE)

    def kernel(x_ref, *refs):
        # ref order: const inputs, then outputs, then scratch
        crefs = refs[: len(consts)]
        out_ref = refs[len(consts)]
        s0, s1 = refs[len(consts) + 1], refs[len(consts) + 2]
        src = x_ref
        for li, op in enumerate(ops):
            dst = out_ref if li == len(ops) - 1 else (s0 if li % 2 == 0 else s1)
            if op.kind == "softmax":
                # reference R10 (src/ops/softmax.rs:36): e = f32(q)*in_s
                # (NO zp subtraction, by design); masked exp, all-lane
                # total via an f32 MXU dot against ones
                mref = crefs[op._sm_idx]
                x8 = src[:, 0:LANE]
                e = x8.astype(jnp.float32) * np.float32(op.sm_in_scale)
                ex = jnp.exp(e) * mref[0:1, :]
                # all-lane total: cross-lane f32 sum (exact -- the
                # masked lanes contribute 0.0, so any association gives
                # exactly the sum of the real lanes; an MXU f32 dot is
                # NOT exact here, its default precision is bf16 passes)
                total = jnp.sum(ex, axis=1, keepdims=True)
                y = (ex / total / np.float32(op.sm_out_scale)
                     + np.float32(op.out_zp))
                y = lax.round(y, lax.RoundingMethod.AWAY_FROM_ZERO)
                y = jnp.clip(y, -128.0, 127.0)
                dst[:, 0:LANE] = y.astype(jnp.int8)
                src = dst
                continue
            if op.epi == "pool":
                # pool keeps its own epilogue except under the pure-MXU
                # "raw" measurement mode (it has no d/bias/c1 planes)
                mode = "raw" if requant == "raw" else "pool"
            else:
                mode = requant
            if mode == "pool":
                rref = crefs[op._r_idx]
                bref = crefs[op._b_idx]
                cref = crefs[op._c_idx]
            elif mode == "fixed":
                dbref = crefs[op._db_idx]
                fmref = crefs[op._fm_idx]
            elif mode != "raw":
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
                if mode == "raw":
                    # measurement-only epilogue (NOT bit-exact): isolates
                    # the VPU requant cost from the MXU dot cost in situ
                    dst[:, out_lo : out_lo + ncols] = acc.astype(jnp.int8)
                    return
                if mode == "noround":
                    # measurement-only (NOT bit-exact): full chain minus
                    # the round-away step, pricing lax.round's VPU share
                    q = acc + dref[0:1, out_lo : out_lo + ncols]
                    y = (bref[0:1, out_lo : out_lo + ncols]
                         + cref[0:1, out_lo : out_lo + ncols]
                         * q.astype(jnp.float32))
                    dst[:, out_lo : out_lo + ncols] = y.astype(jnp.int8)
                    return
                if mode == "pool":
                    # reference R9: y = roundf(C0 * (recip*f32(sum)) + C1)
                    t = (rref[0:1, out_lo : out_lo + ncols]
                         * acc.astype(jnp.float32))
                    y = (cref[0:1, out_lo : out_lo + ncols] * t
                         + bref[0:1, out_lo : out_lo + ncols])
                    y = lax.round(y, lax.RoundingMethod.AWAY_FROM_ZERO)
                    y = jnp.clip(y, max(op.clip_lo, -128.0),
                                 min(op.clip_hi, 127.0))
                    dst[:, out_lo : out_lo + ncols] = y.astype(jnp.int8)
                    return
                if mode == "fixed":
                    # integer (M, S) epilogue (core/fixedpoint.py):
                    # y = round_away((acc + db) * (M * 2**-S)) + out_zp.
                    # Value-identical to the two-plane round-4 form
                    # (power-of-2 scale folds into M exactly; i32 db
                    # pre-add equals the f32 add since |acc+db| < 2**24)
                    # but 3-4 fewer VPU passes: i32 add like exact2, one
                    # multiply, round via trunc(p + copysign(0.5, p))
                    # (jnp.trunc, needed because out_zp lands AFTER the
                    # round -- the cast trick alone can't absorb it),
                    # then integral f32 adds/clips and an exact cast.
                    q = acc + dbref[0:1, out_lo : out_lo + ncols]
                    p = (q.astype(jnp.float32)
                         * fmref[0:1, out_lo : out_lo + ncols])
                    t = jnp.trunc(p + jnp.where(p >= 0, np.float32(0.5),
                                                np.float32(-0.5)))
                    y = t + np.float32(op.out_zp)
                    y = jnp.clip(y, op.clip_lo, op.clip_hi)
                    dst[:, out_lo : out_lo + ncols] = y.astype(jnp.int8)
                    return
                q = acc + dref[0:1, out_lo : out_lo + ncols]
                y = (bref[0:1, out_lo : out_lo + ncols]
                     + cref[0:1, out_lo : out_lo + ncols] * q.astype(jnp.float32))
                if mode == "exact2":
                    # round-away via the trunc identity:
                    # round_away(y) = trunc(y + copysign(0.5, y)), and
                    # Mosaic's f32->int8 convert truncates toward zero
                    # and saturates (scripts/probe_cast.py) -- so the
                    # +-0.5 shift folds the round into the cast.  Exact:
                    # clip(trunc(t), lo, hi) == trunc(clip(t, lo, hi))
                    # for integral bounds; at y = -0.0 the select picks
                    # +0.5 where copysign picks -0.5, but both truncate
                    # to 0.  A compare+select measures ~3% faster than
                    # jnp.copysign on v5e, and a bitwise copysign
                    # ((bits & sign) | 0.5f via i32 and/or) measures a
                    # dead tie with it (7.156 vs 7.158 ms/batch@6144,
                    # tb 512) -- Mosaic lowers both to the same cost.
                    t = y + jnp.where(y >= 0, np.float32(0.5),
                                      np.float32(-0.5))
                    if op.clip_lo > -128.0 or op.clip_hi < 127.0:
                        t = jnp.clip(t, op.clip_lo, op.clip_hi)
                    dst[:, out_lo : out_lo + ncols] = t.astype(jnp.int8)
                    return
                y = lax.round(y, lax.RoundingMethod.AWAY_FROM_ZERO)
                if op.clip_lo > -128.0 or op.clip_hi < 127.0:
                    y = jnp.clip(y, op.clip_lo, op.clip_hi)
                # else: the f32->int8 cast saturates in hardware (probed)
                dst[:, out_lo : out_lo + ncols] = y.astype(jnp.int8)

            if op.kind == "taps":
                # VPU shift-MAC dw: per aligned output span, sum the
                # tap slices against edge-masked weight planes (a tap
                # is skipped outside its safe range, where its plane is
                # provably zero -- see _try_taps)
                cover = sorted({lo for lo, _ in op.tap_ranges}
                               | {hi for _, hi in op.tap_ranges})
                for a, b in zip(cover, cover[1:]):
                    acc = None
                    for shift, pidx, (lo, hi) in zip(op.taps, op._t_idx,
                                                     op.tap_ranges):
                        if lo > a or hi < b:
                            continue
                        pref = crefs[pidx]
                        sl = src[:, a + shift : b + shift].astype(jnp.int32)
                        term = sl * pref[0:1, a:b]
                        acc = term if acc is None else acc + term
                    if acc is not None:
                        emit_requant(a, b - a, acc)
            else:
                # software-pipeline: the MXU dots of the next `depth`
                # groups are emitted before group g's VPU requant so
                # the scheduler can overlap the units
                pending = []
                for out_lo, parts in op.groups:
                    pending.append(emit_dots(out_lo, parts))
                    if len(pending) > depth:
                        emit_requant(*pending.pop(0))
                while pending:
                    emit_requant(*pending.pop(0))
            src = dst

    def flat_fn(xq):
        b = xq.shape[0]
        if b % tb:
            raise ValueError(f"batch {b} not divisible by flat tile {tb}")
        in_specs = [pl.BlockSpec((tb, in_lanes_p), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)]
        for carr in consts:
            zeros = (0,) * carr.ndim
            in_specs.append(pl.BlockSpec(carr.shape, lambda i, z=zeros: z,
                                         memory_space=pltpu.VMEM))
        xp = xq
        if meta["in_off"]:
            xp = jnp.pad(xq, ((0, 0), (meta["in_off"],
                                       in_lanes_p - meta["in_lanes"] - meta["in_off"])))
        elif in_lanes_p != -(-meta["in_lanes"] // 128) * 128:
            # Guard the undocumented-Mosaic dependence (round-4 advisor):
            # the pad-free OOB read below is only provably inside the
            # array's physical (32,128)-padded tile when in_lanes_p is
            # exactly in_lanes rounded up to the 128-lane boundary.
            # Anything wider must take the explicit-pad path.
            xp = jnp.pad(xq, ((0, 0), (0, in_lanes_p - meta["in_lanes"])))
        # in_off == 0 with in_lanes % 128 != 0 needs NO pad: the input
        # BlockSpec (tb, in_lanes_p) simply exceeds the array's lane dim,
        # and Mosaic DMAs the array's physical (32,128)-padded tile --
        # the out-of-bounds lanes read arbitrary values, but every
        # matrix row / tap plane referencing them is zero by
        # construction (taps only index real input lanes), so the dot
        # contribution is exactly 0 (scripts/probe_pad.py).  The old
        # jnp.pad was a full HBM round-trip of the batch (~11% of the
        # speech kernel's runtime, docs/PERFORMANCE.md round 4).
        return pl.pallas_call(
            kernel,
            grid=(b // tb,),
            out_shape=jax.ShapeDtypeStruct((b, out_lanes_p), jnp.int8),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((tb, out_lanes_p), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((tb, scratch_lanes), jnp.int8),
                            pltpu.VMEM((tb, scratch_lanes), jnp.int8)],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
            interpret=interpret,
        )(xp, *consts)

    return flat_fn, n_layers, meta
