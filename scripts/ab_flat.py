#!/usr/bin/env python
"""Same-process A/B of backend='flat' vs 'xla' on a bundled model (TPU).

Chained-dispatch methodology per CLAUDE.md: warmup + host readback,
then ITERS chained full-model dispatches (output bumps the next input)
per segment, alternating xla/flat segments so clock ramp affects both
equally.  Also asserts bit-parity first.  Usage: ab_flat.py [B] [ITERS]
[reps] [model]
"""

import os
import sys
import time

sys.path.insert(0, os.path.normpath(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")))

import jax
import jax.numpy as jnp
import numpy as np

from microflow_tpu import compile_tflite

args = sys.argv[1:]
B = int(args[0]) if args else 6144
ITERS = int(args[1]) if len(args) > 1 else 50
REPS = int(args[2]) if len(args) > 2 else 4
MODEL = args[3] if len(args) > 3 else "models/person_detect.tflite"

xla = compile_tflite(MODEL, backend="xla")
flat = compile_tflite(MODEL, backend="flat")
IN_SHAPE = tuple(xla.graph.input_shape)

rng = np.random.default_rng(0)
xq0 = rng.integers(-128, 128, (4, *IN_SHAPE), dtype=np.int8)
a = np.asarray(xla.predict_inner(xq0))
b = np.asarray(flat.predict_inner(xq0))
assert np.array_equal(a, b), f"PARITY FAIL max|d|={np.abs(a.astype(int) - b.astype(int)).max()}"
print("parity: bit-exact on random int8 batch", flush=True)


def chain_fn(model):
    def run(params, xq):
        yq = model._forward(params, xq)
        bump = yq.reshape(yq.shape[0], -1)[:, :1]
        bump = bump.reshape(bump.shape + (1,) * (xq.ndim - bump.ndim))
        return (xq + bump).astype(xq.dtype), yq

    return jax.jit(run)


chains = {"xla": (xla, chain_fn(xla)), "flat": (flat, chain_fn(flat))}
xq = jax.device_put(jax.random.randint(
    jax.random.PRNGKey(0), (B, *IN_SHAPE), -128, 128, dtype=jnp.int8))
state = {}
for name, (model, ch) in chains.items():
    t0 = time.time()
    x, y = ch(model.params, xq)
    _ = int(np.asarray(y.reshape(-1)[0]))
    state[name] = x
    print(f"compiled {name} chain in {time.time()-t0:.1f}s", flush=True)

times = {"xla": [], "flat": []}
for rep in range(REPS):
    for name in ("xla", "flat"):
        model, ch = chains[name]
        x = state[name]
        t0 = time.time()
        for _ in range(ITERS):
            x, y = ch(model.params, x)
        _ = int(np.asarray(y.reshape(-1)[0]))
        dt = (time.time() - t0) / ITERS * 1e3
        state[name] = x
        times[name].append(dt)
        print(f"rep {rep} {name:<5} {dt:7.3f} ms/batch "
              f"({B / dt * 1e3:,.0f} inf/s)", flush=True)

mx = min(times["xla"])
mf = min(times["flat"])
print(f"\nbest: xla {mx:.3f} ms ({B/mx*1e3:,.0f}/s)  "
      f"flat {mf:.3f} ms ({B/mf*1e3:,.0f}/s)  "
      f"flat/xla speedup = {mx/mf:.3f}x")
