#!/usr/bin/env python
"""Per-layer timing of person_detect at serving batch, to find where
the batch-time actually goes (stderr diagnostics only, not a bench)."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from microflow_tpu import compile_tflite
from microflow_tpu.compiler.builder import apply_layer

BACKEND = sys.argv[1] if len(sys.argv) > 1 else "xla"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 512

model = compile_tflite("models/person_detect.tflite", backend=BACKEND)
graph = model.graph

key = jax.random.PRNGKey(0)
x = jax.random.randint(key, (B, *graph.input_shape), -128, 128, dtype=jnp.int8)

rows = []
total = 0.0
for layer in graph.layers:
    fn = jax.jit(lambda p, v, l=layer: apply_layer(l, p, v, BACKEND))
    y = fn(model.params, x)
    y.block_until_ready()
    # serialized timing loop with host readback as barrier
    iters = 20
    t0 = time.time()
    for _ in range(iters):
        y = fn(model.params, x)
    _ = np.asarray(y.reshape(-1)[0])
    dt = (time.time() - t0) / iters * 1e3
    total += dt
    name = type(layer).__name__.replace("Layer", "")
    shape = tuple(y.shape)
    rows.append((layer.index, name, shape, dt))
    x = y

print(f"backend={BACKEND} batch={B}", file=sys.stderr)
for idx, name, shape, dt in sorted(rows, key=lambda r: -r[3]):
    print(f"  layer{idx:>3} {name:<18} out={str(shape):<22} {dt:7.3f} ms", file=sys.stderr)
print(f"  sum of layers: {total:.3f} ms", file=sys.stderr)
