#!/usr/bin/env python
"""Flat-kernel sweep: parity vs XLA + chained bench per (cut, tb).

Usage: sweep_flat.py [cut:tb ...]   e.g. sweep_flat.py 7:256 25:256
"""

import os
import sys
import time

sys.path.insert(0, os.path.normpath(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")))

import jax
import jax.numpy as jnp
import numpy as np

from microflow_tpu import compile_tflite

CFGS = [tuple(int(v) for v in a.split(":")) for a in sys.argv[1:]] or [(7, 256), (25, 256)]
B, ITERS = 6144, 30


def bench(model, B, iters):
    @jax.jit
    def chain(params, xq):
        yq = model._forward(params, xq)
        bump = yq.reshape(yq.shape[0], -1)[:, :1]
        bump = bump.reshape(bump.shape + (1,) * (xq.ndim - bump.ndim))
        return (xq + bump).astype(xq.dtype), yq

    xq = jax.device_put(jax.random.randint(
        jax.random.PRNGKey(0), (B, 96, 96, 1), -128, 128, dtype=jnp.int8))
    t0 = time.time()
    x, y = chain(model.params, xq)
    _ = int(y.reshape(-1)[0])
    cs = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        x, y = chain(model.params, x)
    _ = int(y.reshape(-1)[0])
    return B / ((time.time() - t0) / iters), cs


m_x = compile_tflite("models/person_detect.tflite", backend="xla")
rng = np.random.default_rng(0)
xq_small = rng.integers(-128, 128, (64, 96, 96, 1), dtype=np.int8)
y_ref = np.asarray(m_x._forward(m_x.params, jnp.asarray(xq_small)))
r_x, _ = bench(m_x, B, ITERS)
print(f"xla: {r_x:,.0f} inf/s", flush=True)

for cut, tb in CFGS:
    os.environ["MFT_FLAT_LAYERS"] = str(cut)
    os.environ["MFT_FLAT_TB"] = str(tb)
    try:
        m_f = compile_tflite("models/person_detect.tflite", backend="flat")
        y_f = np.asarray(m_f._forward(m_f.params, jnp.asarray(xq_small)))
        ok = np.array_equal(y_ref, y_f)
        r_f, cs = bench(m_f, B, ITERS)
        print(f"cut={cut} (n={m_f._flat[1]}) tb={tb}: {r_f:,.0f} inf/s, "
              f"parity={ok}, compile={cs:.0f}s", flush=True)
    except Exception as e:
        print(f"cut={cut} tb={tb}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
