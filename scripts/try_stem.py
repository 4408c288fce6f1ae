#!/usr/bin/env python
"""Microbenchmarks for stem-layer lowering variants at serving batch.
Times raw int8 accumulator convs (no requant) -- relative numbers only."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
key = jax.random.PRNGKey(0)
x1 = jax.device_put(jax.random.randint(key, (B, 96, 96, 1), -128, 128, dtype=jnp.int8))
x8 = jax.device_put(jax.random.randint(key, (B, 48, 48, 8), -128, 128, dtype=jnp.int8))
w0 = jnp.asarray(np.random.randint(-128, 128, (8, 3, 3, 1), np.int8))
w0s = jnp.asarray(np.random.randint(-128, 128, (8, 2, 2, 4), np.int8))
w1 = jnp.asarray(np.random.randint(-128, 128, (8, 3, 3, 1), np.int8))  # dw as OHWI grouped
w1s = jnp.asarray(np.random.randint(-128, 128, (32, 2, 2, 4), np.int8))  # s2d dw: fgc=8
DN = ("NHWC", "OHWI", "NHWC")


def timeit(name, fn, *args):
    f = jax.jit(fn)
    r = f(*args); r.block_until_ready()
    t0 = time.time()
    for _ in range(8):
        r = f(*args)
    _ = int(jnp.sum(r.astype(jnp.int32)).block_until_ready())
    print(f"{name:<28} {(time.time()-t0)/8*1e3:8.3f} ms", file=sys.stderr)


# --- L0 variants: [B,96,96,1] -> [B,48,48,8] accumulator
def l0_conv(x):
    xp = jnp.pad(x, ((0, 0), (1, 0), (1, 0), (0, 0)), constant_values=np.int8(-1))
    return lax.conv_general_dilated(xp, w0, (2, 2), "VALID", dimension_numbers=DN,
                                    preferred_element_type=jnp.int32)

def l0_s2d(x):
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)), constant_values=np.int8(-1))  # 100x100
    s2d = xp.reshape(B, 50, 2, 50, 2, 1).transpose(0, 1, 3, 2, 4, 5).reshape(B, 50, 50, 4)
    return lax.conv_general_dilated(s2d, w0s, (1, 1), "VALID", dimension_numbers=DN,
                                    preferred_element_type=jnp.int32)[:, :48, :48, :]

# --- L1 variants: [B,48,48,8] -> [B,48,48,8] dw accumulator
def l1_dw(x):
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=np.int8(-1))
    return lax.conv_general_dilated(xp, w1, (1, 1), "VALID", dimension_numbers=DN,
                                    feature_group_count=8, preferred_element_type=jnp.int32)

def l1_taps(x):
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=np.int8(-1)).astype(jnp.int32)
    wr = w1.reshape(8, 9).T.reshape(3, 3, 8).astype(jnp.int32)
    acc = jnp.zeros((B, 48, 48, 8), jnp.int32)
    for m in range(3):
        for n in range(3):
            acc = acc + xp[:, m:m+48, n:n+48, :] * wr[m, n][None, None, None, :]
    return acc

def l1_s2d(x):
    # s2d(2x2): [B,48,48,8] -> [B,24,24,32], dw 3x3 becomes fgc=8 4x4-ish;
    # here: approximate cost with a fgc=8 [32,2,2,4] conv on the s2d image
    s2d = x.reshape(B, 24, 2, 24, 2, 8).transpose(0, 1, 3, 2, 4, 5).reshape(B, 24, 24, 32)
    sp = jnp.pad(s2d, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=np.int8(-1))
    return lax.conv_general_dilated(sp, w1s, (1, 1), "VALID", dimension_numbers=DN,
                                    feature_group_count=8, preferred_element_type=jnp.int32)

# --- combined: how much is pure HBM streaming? one elementwise pass
def stream(x):
    return x.astype(jnp.int32) * 3

timeit("L0 conv s2 (current)", l0_conv, x1)
timeit("L0 s2d conv s1", l0_s2d, x1)
timeit("L1 dw fgc=8 (current)", l1_dw, x8)
timeit("L1 9-tap shifted adds", l1_taps, x8)
timeit("L1 s2d fgc=8 2x2", l1_s2d, x8)
timeit("stream x8 (i32 out)", stream, x8)
EOF = None
