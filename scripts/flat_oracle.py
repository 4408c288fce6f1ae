#!/usr/bin/env python
"""NumPy simulation of the flat-kernel plan vs the XLA layer chain.

Executes every planned op (conv dot groups, VPU tap MACs, requant
epilogue) in float32/int32 numpy exactly as the Pallas kernel does, and
diffs each layer boundary against apply_layer(..., "xla").  Much faster
than Pallas interpret mode for debugging plan/epilogue bugs, and pins
the first divergent layer.  Usage: flat_oracle.py [model] [batch]
"""

import os
import sys

sys.path.insert(0, os.path.normpath(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

from microflow_tpu.frontend.parser import parse
from microflow_tpu.kernels.flatpack import plan_flat


def round_away(y):
    return np.where(y >= 0, np.floor(y + np.float32(0.5)),
                    np.ceil(y - np.float32(0.5))).astype(np.float32)


def run_op(op, src):
    """src: int8 [B, lanes_in_p] -> int8 [B, lanes_out_p]."""
    b = src.shape[0]
    if op.kind == "softmax":
        e = src[:, :128].astype(np.float32) * np.float32(op.sm_in_scale)
        ex = np.exp(e).astype(np.float32) * op.sm_mask
        total = ex.sum(axis=1, keepdims=True).astype(np.float32)
        y = ex / total / np.float32(op.sm_out_scale) + np.float32(op.out_zp)
        y = np.clip(round_away(y), -128.0, 127.0)
        return y.astype(np.int8)
    acc_full = np.zeros((b, op.lanes_out_p), np.int32)
    if op.kind == "taps":
        cover = sorted({lo for lo, _ in op.tap_ranges}
                       | {hi for _, hi in op.tap_ranges})
        for a, e in zip(cover, cover[1:]):
            for shift, plane, (lo, hi) in zip(op.taps, op.tap_planes,
                                              op.tap_ranges):
                if lo > a or hi < e:
                    continue
                sl = src[:, a + shift : e + shift].astype(np.int32)
                acc_full[:, a:e] += sl * plane[0:1, a:e]
    else:
        for out_lo, parts in op.groups:
            for lo, cid in parts:
                m = op.mats[cid].astype(np.int32)
                acc_full[:, out_lo : out_lo + m.shape[1]] += (
                    src[:, lo : lo + m.shape[0]].astype(np.int32) @ m)
    if op.epi == "pool":
        t = op.r_plane.astype(np.float32) * acc_full.astype(np.float32)
        y = (op.c1_plane.astype(np.float32) * t
             + op.bias_plane.astype(np.float32))
    else:
        q = acc_full + op.d_plane.astype(np.int32)
        y = (op.bias_plane.astype(np.float32)
             + op.c1_plane.astype(np.float32) * q.astype(np.float32))
    y = round_away(y)
    y = np.clip(y, op.clip_lo, op.clip_hi)
    return y.astype(np.int8)


def main():
    import jax.numpy as jnp

    from microflow_tpu.compiler.builder import apply_layer, init_params

    args = sys.argv[1:]
    path = args[0] if args else "models/person_detect.tflite"
    b = int(args[1]) if len(args) > 1 else 4
    graph = parse(path)
    plan = plan_flat(graph)
    if plan is None:
        sys.exit("not flat-packable")
    ops, n, meta = plan
    params = init_params(graph)
    rng = np.random.default_rng(5)
    xq = rng.integers(-128, 128, (b, *graph.input_shape), dtype=np.int8)

    cur = np.zeros((b, meta["in_lanes_p"]), np.int8)
    cur[:, meta["in_off"] : meta["in_off"] + meta["in_lanes"]] = xq.reshape(b, -1)
    want = jnp.asarray(xq)
    bad = 0
    done = 0
    for op in ops:
        cur = run_op(op, cur)
        li = op.layer_idx
        while done <= li:  # includes any skipped reshape layers
            want = apply_layer(graph.layers[done], params, want, "xla")
            done += 1
        w = np.asarray(want).reshape(b, -1)
        got = cur[:, op.out_off : op.out_off + op.lanes_out]
        d = np.abs(got.astype(np.int32) - w.astype(np.int32))
        tag = "OK " if d.max() == 0 else "BAD"
        if d.max():
            bad += 1
            i = np.unravel_index(d.argmax(), d.shape)
            print(f"{tag} L{li:<2} {op.kind:<5} max|d|={d.max()} "
                  f"n_bad={(d > 0).sum()} first@{i} got={got[i]} want={w[i]}")
        else:
            print(f"{tag} L{li:<2} {op.kind:<5} off {op.in_off}->{op.out_off}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
