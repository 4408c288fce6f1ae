#!/usr/bin/env python
"""Probe: int8-split MXU formulation of the training-backward einsums.

The conv backward's hot einsums run in i32 (VPU-emulated multiplies --
the MXU is int8/bf16 only).  But the gradient entering any conv/dw
layer of the bundled models is provably in [-255, 255]:

* loss gradients are differences of int8-grid values
  (``mse_grad``/``crossentropy_grad``: |pred - target| <= 255);
* a conv layer's outgoing d_in is round_away(sum(md*wc)/sum|md|) --
  a weighted average of centered weights, |wc| <= 255, so
  |d_in| <= 255 (the dw scalar norm >= the masked |md| sum, same
  bound); NaN -> 0;
* avgpool backward adds md once per covering window (cover = 1 for
  person_detect's global pool).

Any i32 value m in [-255, 255] splits exactly as m = 128*mh + ml with
mh = m >> 7 in [-2, 1] and ml = m - 128*mh in [0, 127] -- both int8.
So  einsum(x_i8, md) = 128*dot(x, mh) + dot(x, ml)  is TWO int8 MXU
matmuls, exact in i32.  This script A/Bs the two formulations of the
per-tap dW einsum and the transpose d_in einsum on person_detect's
trained-layer shapes, batched at B, asserting bit-equality.

Usage: probe_bwd_mxu.py [B] [ITERS]
"""

import os
import sys
import time

sys.path.insert(0, os.path.normpath(os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..")))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 30

rng = np.random.default_rng(0)

# person_detect trained-suffix shapes: 6x6 spatial, C=F=256 1x1 convs
IJ, C, F = 36, 256, 256

x8 = jnp.asarray(rng.integers(-128, 128, (B, IJ, C), np.int64), jnp.int8)
md = jnp.asarray(rng.integers(-255, 256, (B, IJ, F), np.int64), jnp.int32)
w8 = jnp.asarray(rng.integers(-127, 128, (F, C), np.int64), jnp.int8)


def dw_i32(x8, md):
    return jnp.einsum("bic,bif->bfc", x8.astype(jnp.int32), md)


def split(m):
    mh = (m >> 7).astype(jnp.int8)
    ml = (m - 128 * (m >> 7)).astype(jnp.int8)
    return mh, ml


def dw_mxu(x8, md):
    mh, ml = split(md)
    d1 = jnp.einsum("bic,bif->bfc", x8, mh,
                    preferred_element_type=jnp.int32)
    d2 = jnp.einsum("bic,bif->bfc", x8, ml,
                    preferred_element_type=jnp.int32)
    return 128 * d1 + d2


def din_i32(md, w8):
    return jnp.einsum("bif,fc->bic", md, w8.astype(jnp.int32))


def din_mxu(md, w8):
    mh, ml = split(md)
    d1 = jnp.einsum("bif,fc->bic", mh, w8,
                    preferred_element_type=jnp.int32)
    d2 = jnp.einsum("bif,fc->bic", ml, w8,
                    preferred_element_type=jnp.int32)
    return 128 * d1 + d2


for name, a_fn, b_fn, args in (
        ("dW   (bic,bif->bfc)", dw_i32, dw_mxu, (x8, md)),
        ("dIn  (bif,fc->bic)", din_i32, din_mxu, (md, w8))):
    want = np.asarray(jax.jit(a_fn)(*args))
    got = np.asarray(jax.jit(b_fn)(*args))
    print(f"{name}: bit-exact {np.array_equal(want, got)}")
    for label, fn in (("i32", a_fn), ("mxu-split", b_fn)):
        @jax.jit
        def chain(a0, a1, fn=fn):
            def step(_, carry):
                y = fn(carry, a1)
                # data-dependent bump to stop folding
                bump = y.reshape(-1)[0].astype(a0.dtype)
                return (carry + bump).astype(a0.dtype)
            return lax.fori_loop(0, ITERS, step, a0), None

        t0 = time.time()
        out, _ = chain(*args)
        _ = np.asarray(out.reshape(-1)[0])
        comp = time.time() - t0
        best = None
        for _ in range(3):
            t0 = time.time()
            out, _ = chain(*args)
            _ = np.asarray(out.reshape(-1)[0])
            dt = (time.time() - t0) / ITERS * 1e3
            best = dt if best is None else min(best, dt)
        print(f"  {label:<10} compile {comp:5.1f}s  {best:7.3f} ms/call")
