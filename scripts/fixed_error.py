#!/usr/bin/env python
"""Exhaustive per-layer LSB error of the fixed-point (M, S) requant vs
the exact-f32 recipe (round-4 VERDICT task 8; no TPU needed).

For every conv/dw/fc layer and every quant channel, both epilogues are
pure monotonic functions of the integer accumulator-with-zp-correction
``q = acc + d``:

    exact:  y = clip(round_away(out_zp + C0 + C1 * q))
    fixed:  p = (q + bias_q) * M carried in f32 (the flat kernel's
            carry, kernels/flatpack.py requant="fixed");
            y = clip(sign(p) * floor(|p| * 2**-S + 0.5) + out_zp)

with (M, S) = quantize_multiplier(C1) and bias_q = round(C0 / C1)
(core/fixedpoint.py).  SAME-padding d-plane variation only shifts q, so
sweeping q over the window where either output is unclipped -- clipped
outputs agree by construction -- intersected with the layer's reachable
accumulator range (|q| <= 128 * sum|w| + |d|) is a COMPLETE
characterization, not a sample.  Errors are reported as max |LSB| per
layer; the end-to-end composition is gated at <=2 LSB by
tests/test_fixedpoint.py and tests/test_flatpack.py.

Usage: fixed_error.py [--csv]  (writes analysis/data/fixed_error.csv)
"""

import os
import sys

sys.path.insert(0, os.path.normpath(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")))

import numpy as np

from microflow_tpu.compiler.ir import (Conv2DLayer, DepthwiseConv2DLayer,
                                       FullyConnectedLayer)
from microflow_tpu.core.fixedpoint import quantize_multiplier
from microflow_tpu.frontend.parser import parse

MAX_WINDOW = 8_000_000  # q values per channel; larger windows truncate


def layer_channels(layer):
    """(weights-per-channel matrix |w| sums, c0, c1) broadcast to the
    layer's output-channel count."""
    if isinstance(layer, FullyConnectedLayer):
        w = layer.weights  # [K, N]
        sw = np.abs(w.astype(np.int64)).sum(axis=0)
        n = w.shape[1]
    elif isinstance(layer, DepthwiseConv2DLayer):
        w = layer.weights  # [KH, KW, C]
        sw = np.abs(w.astype(np.int64)).sum(axis=(0, 1))
        n = w.shape[2]
    elif isinstance(layer, Conv2DLayer):
        w = layer.filters  # [F, KH, KW, C]
        sw = np.abs(w.astype(np.int64)).sum(axis=(1, 2, 3))
        n = w.shape[0]
    else:
        return None
    c0 = np.broadcast_to(np.atleast_1d(layer.c0).astype(np.float64), (n,))
    c1v = np.atleast_1d(np.asarray(layer.c1, np.float64))
    c1 = np.array([c1v[i] if i < len(c1v) else c1v[0] for i in range(n)])
    return sw, c0, c1


def channel_error(sw, c0, c1, out_zp, in_zp):
    """Max |LSB| of fixed vs exact over the channel's reachable,
    unclipped q window; returns (err, window, truncated)."""
    if c1 == 0.0:
        return 0, 0, False
    m, s = quantize_multiplier(c1)
    bias_q = np.round(c0 / c1)
    # q window where either form is unclipped (targets -130..129 cover
    # both), intersected with reachability
    qa = (-130.0 - out_zp - c0) / c1
    qb = (129.0 - out_zp - c0) / c1
    q_lo, q_hi = int(np.floor(min(qa, qb))) - 2, int(np.ceil(max(qa, qb))) + 2
    reach = int(128 * sw + abs(in_zp) * sw + 1)
    q_lo, q_hi = max(q_lo, -reach), min(q_hi, reach)
    if q_hi <= q_lo:
        return 0, 0, False
    truncated = (q_hi - q_lo) > MAX_WINDOW
    if truncated:
        q_hi = q_lo + MAX_WINDOW
    q = np.arange(q_lo, q_hi, dtype=np.float64)

    ye = out_zp + c0 + c1 * q
    ye = np.sign(ye) * np.floor(np.abs(ye) + 0.5)  # round half away
    ye = np.clip(ye, -128, 127)

    p = ((q + bias_q).astype(np.float32) * np.float32(m)).astype(np.float64)
    mag = np.floor(np.abs(p).astype(np.float32)
                   * np.float32(np.exp2(-s)) + np.float32(0.5))
    yf = np.clip(np.sign(p) * mag + out_zp, -128, 127)
    return int(np.abs(yf - ye).max()), q_hi - q_lo, truncated


def main():
    rows = []
    for name in ("sine", "speech", "person_detect"):
        g = parse(os.path.join(os.path.dirname(__file__), "..", "models",
                               f"{name}.tflite"))
        for idx, layer in enumerate(g.layers):
            ch = layer_channels(layer)
            if ch is None:
                continue
            sw, c0, c1 = ch
            out_zp = layer.out_q.zp0
            in_zp = layer.in_q.zp0
            worst, wq, any_trunc = 0, 0, False
            for i in range(len(sw)):
                e, w, t = channel_error(int(sw[i]), float(c0[i]),
                                        float(c1[i]), out_zp, in_zp)
                worst = max(worst, e)
                wq = max(wq, w)
                any_trunc |= t
            rows.append((name, idx, type(layer).__name__.replace("Layer", ""),
                         len(sw), wq, worst, any_trunc))
            print(f"{name:<14} L{idx:<3} {rows[-1][2]:<16} ch={len(sw):<4} "
                  f"q-window {wq:>9,}  max|LSB| = {worst}"
                  f"{'  (window truncated)' if any_trunc else ''}")
    assert all(r[5] <= 1 for r in rows), "a layer exceeds 1 LSB"
    print(f"\nall {len(rows)} conv/dw/fc layers across 3 models: "
          f"max per-layer |LSB| = {max(r[5] for r in rows)}")
    if "--csv" in sys.argv:
        import csv

        out = os.path.join(os.path.dirname(__file__), "..", "analysis",
                           "data", "fixed_error.csv")
        with open(out, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["model", "layer", "kind", "channels",
                        "q_window", "max_lsb_error", "window_truncated"])
            w.writerows(rows)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
