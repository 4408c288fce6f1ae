#!/usr/bin/env python
"""Probe the true Mosaic int8 MXU dot rate and the MXU/VPU overlap.

Round-1's P4 probe chained reps via `v + r*0`, which XLA's algebraic
simplifier can kill, so its 149 T-slots/s is unreliable.  Here each rep
is ordered by a 1-vreg scratch store that the next rep's window load
aliases -- no big int8<->i32 conversions, no concats (per-chunk ref
stores).  Variants:

  dots-i32   NCH dots [M,W]@[W,128] -> store i32     (pure MXU + store)
  dots-k128  same with W=128                          (1/3 the slots)
  requant    NCH requant chains on a cached i32 acc  (pure VPU)
  both       dots + requant -> store i8               (the real shape)

If t(both) ~ max(t(dots), t(requant)) the LLO scheduler overlaps MXU
and VPU; if ~ sum, it serializes.  dots-i32 vs dots-k128 slope gives
the marginal MXU slot rate net of fixed overheads.
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

M, W, NCH, REP = 256, 384, 12, 512
L = NCH * 128


def make(kind, w_width):
    out_dtype = jnp.int32 if kind.startswith("dots") else jnp.int8

    def kernel(x_ref, w_ref, d_ref, b_ref, c_ref, o_ref, s_ref):
        s_ref[:] = x_ref[:]

        def body(rep, tok):
            last = None
            for j in range(NCH):
                lo = j * 128
                win = s_ref[:, lo : lo + w_width]
                if kind == "requant":
                    acc = w_ref[:]  # cached i32 acc operand, no dot
                else:
                    acc = lax.dot_general(win, w_ref[:], (((1,), (0,)), ((), ())),
                                          preferred_element_type=jnp.int32)
                if kind in ("requant", "both"):
                    q = acc + d_ref[0:1, lo : lo + 128]
                    y = b_ref[0:1, lo : lo + 128] + c_ref[0:1, lo : lo + 128] * q.astype(jnp.float32)
                    y = lax.round(y, lax.RoundingMethod.AWAY_FROM_ZERO)
                    y = jnp.clip(y, -128.0, 127.0).astype(out_dtype)
                else:
                    y = acc
                o_ref[:, lo : lo + 128] = y
                if j == 0:
                    last = y
            # 1-vreg ordering store: next rep's chunk-0 window aliases it
            s_ref[0:8, 0:128] = last[0:8, 0:128].astype(jnp.int8)
            return tok

        lax.fori_loop(0, REP, body, jnp.int32(0))

    return pl.pallas_call(
        kernel,
        grid=(1,),
        out_shape=jax.ShapeDtypeStruct((M, L), out_dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((M, L + W), jnp.int8)],
    )


rng = np.random.default_rng(0)
x = jnp.asarray(rng.integers(-128, 128, (M, L + W), np.int8))
d = jnp.asarray(rng.integers(-1000, 1000, (1, L), np.int32))
b = jnp.asarray(rng.uniform(-4, 4, (1, L)).astype(np.float32))
c = jnp.asarray(rng.uniform(0.001, 0.01, (1, L)).astype(np.float32))
w_by_width = {
    384: jnp.asarray(rng.integers(-128, 128, (384, 128), np.int8)),
    128: jnp.asarray(rng.integers(-128, 128, (128, 128), np.int8)),
}
acc_op = jnp.asarray(rng.integers(-20000, 20000, (M, 128), np.int32))

ITERS = 3
for kind, ww in (("dots-i32", 384), ("dots-k128", 128), ("requant", 384),
                 ("both", 384), ("dots-i32", 384), ("both", 384)):
    w = acc_op if kind == "requant" else w_by_width[ww]
    fn = jax.jit(make(kind, ww if kind != "requant" else 384))
    y = fn(x, w, d, b, c)
    _ = int(np.asarray(y)[0, 0])
    t0 = time.time()
    for _ in range(ITERS):
        y = fn(x, w, d, b, c)
    _ = int(np.asarray(y)[0, 0])
    dt = (time.time() - t0) / (ITERS * REP)
    slots = M * ww * 128 * NCH
    print(f"{kind:10s}: {dt*1e6:7.2f} us/rep  ({slots/dt/1e12:6.1f} T-slots/s, "
          f"{M*L/dt/1e9:5.1f} G-elems/s)", flush=True)
