#!/usr/bin/env python
"""Chained-dispatch timing of XLA suffixes: jit(layers[k:]) for cut k.

suffix(k) = what a fused-prefix hybrid would leave to XLA.  prize(k) =
full - suffix(k) = XLA cost of layers [0,k).  Chained bump + host
readback per the relay rule (CLAUDE.md).  Usage: profile_suffix.py [B] [k ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.normpath(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")))

import jax
import jax.numpy as jnp
import numpy as np

from microflow_tpu import compile_tflite
from microflow_tpu.compiler.builder import apply_layer

args = [int(a) for a in sys.argv[1:]]
B = args[0] if args else 6144
CUTS = args[1:] or [0, 1, 2, 3, 4, 5, 7, 11]
ITERS = 30

model = compile_tflite("models/person_detect.tflite", backend="xla")
graph = model.graph
full = None
for k in CUTS:
    layers = graph.layers[k:]
    in_shape = graph.input_shape if k == 0 else graph.layers[k - 1].out_shape

    def suffix(params, xq, _layers=layers):
        for l in _layers:
            xq = apply_layer(l, params, xq, "xla")
        return xq

    @jax.jit
    def chain(params, xq):
        yq = suffix(params, xq)
        bump = yq.reshape(yq.shape[0], -1)[:, :1]
        bump = bump.reshape(bump.shape + (1,) * (xq.ndim - bump.ndim))
        return (xq + bump).astype(xq.dtype), yq

    xq = jax.device_put(jax.random.randint(
        jax.random.PRNGKey(0), (B, *in_shape), -128, 128, dtype=jnp.int8))
    x, y = chain(model.params, xq)
    _ = int(np.asarray(y.reshape(-1)[0]))
    t0 = time.time()
    for _ in range(ITERS):
        x, y = chain(model.params, x)
    _ = int(np.asarray(y.reshape(-1)[0]))
    dt = (time.time() - t0) / ITERS * 1e3
    if k == 0:
        full = dt
    prize = f"  prize(L0..L{k-1})={full-dt:6.3f} ms" if full is not None and k else ""
    print(f"suffix from {k:>2} (in={str(in_shape):<14}): {dt:7.3f} ms/batch{prize}", flush=True)
