#!/usr/bin/env python
"""Per-layer cost attribution for the packed kernel by cut depth.

For each cut k: the packed kernel runs layers [0, k), XLA runs the tail.
The delta between consecutive cuts = packed cost of the added layers
minus their XLA cost.  Chained dispatches + host readback (CLAUDE.md
relay rule).  Usage: profile_packed_cut.py [tb] [cut ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.normpath(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")))

import jax
import jax.numpy as jnp

from microflow_tpu import compile_tflite

args = [int(a) for a in sys.argv[1:]]
TB = args[0] if args else 8
CUTS = args[1:] or [0, 4, 6, 8, 12, 16, 20, 23]  # plan needs >=4 layers
B, ITERS = 6144, 30
os.environ["MFT_PACKED_TB"] = str(TB)


def bench(model):
    @jax.jit
    def chain(params, xq):
        yq = model._forward(params, xq)
        bump = yq.reshape(yq.shape[0], -1)[:, :1]
        bump = bump.reshape(bump.shape + (1,) * (xq.ndim - bump.ndim))
        return (xq + bump).astype(xq.dtype), yq

    xq = jax.device_put(
        jax.random.randint(jax.random.PRNGKey(0), (B, 96, 96, 1), -128, 128, dtype=jnp.int8))
    x, y = chain(model.params, xq)
    _ = int(y.reshape(-1)[0])
    t0 = time.time()
    for _ in range(ITERS):
        x, y = chain(model.params, x)
    _ = int(y.reshape(-1)[0])
    return (time.time() - t0) / ITERS


prev = None
for cut in CUTS:
    try:
        if cut == 0:
            m = compile_tflite("models/person_detect.tflite", backend="xla")
            n = 0
        else:
            os.environ["MFT_PACKED_LAYERS"] = str(cut)
            m = compile_tflite("models/person_detect.tflite", backend="packed")
            n = m._packed[1]
        dt = bench(m)
        d = f" delta={1e9*(dt-prev)/B:+.0f} ns/inf" if prev is not None else ""
        print(f"cut={cut} (n={n}): {dt*1e3:.3f} ms/batch, {B/dt:,.0f} inf/s{d}", flush=True)
        prev = dt
    except Exception as e:
        print(f"cut={cut}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
        prev = None
