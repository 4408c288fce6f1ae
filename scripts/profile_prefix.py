#!/usr/bin/env python
"""Prefix timing at serving batch: time jit(layers[:k]) for increasing k;
differences give true per-layer costs in streaming context (stderr only)."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from microflow_tpu import compile_tflite
from microflow_tpu.compiler.builder import apply_layer

BACKEND = sys.argv[1] if len(sys.argv) > 1 else "xla"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
ITERS = 8

model = compile_tflite("models/person_detect.tflite", backend=BACKEND)
graph = model.graph
key = jax.random.PRNGKey(0)
x0 = jax.device_put(jax.random.randint(key, (B, *graph.input_shape), -128, 128, dtype=jnp.int8))

prev = 0.0
for k in range(1, len(graph.layers) + 1):
    layers = graph.layers[:k]

    def prefix(params, xq, _layers=layers):
        for l in _layers:
            xq = apply_layer(l, params, xq, BACKEND)
        # collapse to a tiny output so transfer cost is constant
        return jnp.sum(xq.astype(jnp.int32))

    fn = jax.jit(prefix)
    r = fn(model.params, x0); r.block_until_ready()
    t0 = time.time()
    for _ in range(ITERS):
        r = fn(model.params, x0)
    _ = int(r)
    dt = (time.time() - t0) / ITERS * 1e3
    l = graph.layers[k - 1]
    name = type(l).__name__.replace("Layer", "")
    print(f"prefix {k:>2} (+{name:<16} out={str(getattr(l,'out_shape','?')):<14}) "
          f"{dt:8.3f} ms  (delta {dt - prev:+7.3f})", file=sys.stderr)
    prev = dt
