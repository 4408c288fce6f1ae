#!/usr/bin/env python
"""Same-process A/B: column-FC kernel vs XLA on sine (TPU).

Usage: ab_colfc.py [B] [ITERS] [tb...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.normpath(os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..")))

import jax
import jax.numpy as jnp
import numpy as np

from microflow_tpu import compile_tflite
from microflow_tpu.kernels.colfc import build_col_kernel

args = sys.argv[1:]
B = int(args[0]) if args else 524288
ITERS = int(args[1]) if len(args) > 1 else 200
TBS = [int(a) for a in args[2:]] or [8, 32, 128]

m = compile_tflite("models/sine.tflite", name="sine", backend="xla")

rng = np.random.default_rng(0)
xq = rng.integers(-128, 128, (B, 1), dtype=np.int8)
want = None


def timeit(name, chain, x0):
    global want
    t0 = time.time()
    x, y = chain(x0)
    _ = int(np.asarray(y.reshape(-1)[0]))
    comp = time.time() - t0
    best = None
    for _ in range(3):
        t0 = time.time()
        for _ in range(ITERS):
            x, y = chain(x)
        _ = int(np.asarray(y.reshape(-1)[0]))
        dt = (time.time() - t0) / ITERS
        best = dt if best is None else min(best, dt)
    print(f"{name:<14} compile {comp:5.1f}s  {best*1e3:8.3f} ms/batch "
          f"({B/best:,.0f} inf/s, {best/B*1e9:.3f} ns/sample)", flush=True)
    return best


# XLA reference
@jax.jit
def xla_chain(x):
    y = m._forward(m.params, x)
    bump = y[:, :1].astype(jnp.int8)
    return (x + bump).astype(jnp.int8), y

x0 = jax.device_put(jnp.asarray(xq))
t_xla = timeit("xla", xla_chain, x0)
want = np.asarray(m.predict_inner(xq))

for tb in TBS:
    for compute in ("f32", "i32"):
        res = build_col_kernel(m.graph, tb=tb, compute=compute)
        if res is None:
            print(f"tb={tb}: no plan")
            continue
        col_fn, meta = res
        if B % meta["tile"]:
            print(f"tb={tb}: B % tile != 0")
            continue

        @jax.jit
        def col_chain(xt, col_fn=col_fn):
            y = col_fn(xt)
            bump = y[0:1, :].astype(jnp.int8)
            return (xt + bump).astype(jnp.int8), y

        xt0 = jax.device_put(jnp.asarray(xq.reshape(1, B)))
        got = np.asarray(col_fn(xt0)).reshape(B, 1)
        ok = np.array_equal(got, want)
        print(f"tb={tb} {compute} bit-exact: {ok}")
        timeit(f"colfc {compute} tb={tb}", col_chain, xt0)
