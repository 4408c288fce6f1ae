#!/usr/bin/env python
"""Sweep the packed-kernel tile batch (TB): parity vs XLA + chained bench.

Usage: python scripts/sweep_packed_tb.py [tb ...] (default 8 16 32 64)
Env: MFT_SCOPED_VMEM_KIB (default 65536) raises the Mosaic scoped-vmem
stack limit -- the stem/dw i32 accumulators scale with TB.
"""

import os
import sys
import time

sys.path.insert(0, os.path.normpath(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")))

import jax
import jax.numpy as jnp
import numpy as np

from microflow_tpu import compile_tflite

TBS = [int(a) for a in sys.argv[1:]] or [8, 16, 32, 64]
B, ITERS = 6144, 30


def bench(model, B, iters):
    @jax.jit
    def chain(params, xq):
        yq = model._forward(params, xq)
        bump = yq.reshape(yq.shape[0], -1)[:, :1]
        bump = bump.reshape(bump.shape + (1,) * (xq.ndim - bump.ndim))
        return (xq + bump).astype(xq.dtype), yq

    key = jax.random.PRNGKey(0)
    xq = jax.device_put(jax.random.randint(key, (B, 96, 96, 1), -128, 128, dtype=jnp.int8))
    t0 = time.time()
    x, y = chain(model.params, xq)
    _ = int(y.reshape(-1)[0])
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        x, y = chain(model.params, x)
    _ = int(y.reshape(-1)[0])
    dt = (time.time() - t0) / iters
    return B / dt, compile_s


m_x = compile_tflite("models/person_detect.tflite", backend="xla")
rng = np.random.default_rng(0)
xq_small = rng.integers(-128, 128, (64, 96, 96, 1), dtype=np.int8)
y_ref = np.asarray(m_x._forward(m_x.params, jnp.asarray(xq_small)))
r_x, _ = bench(m_x, B, ITERS)
print(f"xla: {r_x:,.0f} inf/s", flush=True)

for tb in TBS:
    os.environ["MFT_PACKED_TB"] = str(tb)
    try:
        m_p = compile_tflite("models/person_detect.tflite", backend="packed")
        y_p = np.asarray(m_p._forward(m_p.params, jnp.asarray(xq_small)))
        ok = np.array_equal(y_ref, y_p)
        r_p, cs = bench(m_p, B, ITERS)
        print(f"tb={tb}: {r_p:,.0f} inf/s, parity={ok}, compile={cs:.0f}s", flush=True)
    except Exception as e:
        print(f"tb={tb}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
