#!/usr/bin/env python
"""Probe Mosaic u8 x s8 -> i32 dot support + speed on the MXU (v5e).

FINDING (2026-08-17, v5e): Mosaic compiles u8 LHS dots WITHOUT error
but computes them WRONG -- u8 operand values >= 128 wrap as signed
(single-dot check: max|d| = 732672 vs the numpy oracle).  u8-centered
activation storage (which would zero the d plane and drop the requant
i32 add, ~0.35 ms/batch) is therefore NOT usable; int8 stays the only
trustworthy MXU operand dtype.  Speed was at parity before the
correctness check (7.2 vs 6.5 T-MACs/s in the loop probe).
"""

import os
import sys
import time

sys.path.insert(0, os.path.normpath(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K, N, NDOT = 512, 768, 128, 24
rng = np.random.default_rng(0)
xu = rng.integers(0, 256, (M, K + NDOT * 128), np.uint8)
xs = (xu.astype(np.int16) - 128).astype(np.int8)
w = rng.integers(-127, 128, (K, N), np.int8)


def make(dtype):
    def kernel(x_ref, w_ref, o_ref):
        def body(rep, tok):
            acc = None
            for j in range(NDOT):
                win = x_ref[:, j * 128 : j * 128 + K]
                a = lax.dot_general(win, w_ref[:], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
                acc = a if acc is None else acc + a
            o_ref[:, :] = acc + tok
            return tok + o_ref[0, 0]

        lax.fori_loop(0, 64, body, jnp.int32(0))

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )


# correctness
ju = jnp.asarray(xu)
js = jnp.asarray(xs)
jw = jnp.asarray(w)
try:
    fn_u = jax.jit(make(jnp.uint8))
    yu = np.asarray(fn_u(ju, jw))
except Exception as e:
    print("u8 dot UNSUPPORTED:", type(e).__name__, str(e)[:200])
    sys.exit(1)
want = sum(xu[:, j * 128 : j * 128 + K].astype(np.int64) @ w.astype(np.int64)
           for j in range(NDOT))
print("u8 x s8 dot correct:", bool(np.array_equal(yu.astype(np.int64), want)))

# speed vs s8
fn_s = jax.jit(make(jnp.int8))
for name, fn, x in (("u8", fn_u, ju), ("s8", fn_s, js)):
    y = fn(x, jw)
    _ = int(np.asarray(y)[0, 0])
    t0 = time.time()
    for _ in range(3):
        y = fn(x, jw)
    _ = int(np.asarray(y)[0, 0])
    dt = (time.time() - t0) / (3 * 64)
    slots = M * K * N * NDOT
    print(f"{name}: {dt*1e6:8.2f} us/rep ({slots/dt/1e12:6.1f} T-MACs/s)")
