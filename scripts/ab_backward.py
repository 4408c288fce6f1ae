#!/usr/bin/env python
"""Same-process A/B of the training backward formulations (round-5).

Variants of the person_detect train step @B (in-jit fori_loop chained,
one-element readback -- profile_train.py methodology):

  scatter   -- round-4 backward: patch-tensor dW einsum + KHxKW at[].add
               input scatters (conv_backward_sample_scatter)
  slices    -- round-5 backward: per-tap strided-slice einsums +
               pad+slice transpose terms (production conv_backward_sample)
  noaccum   -- slices backward with the serial saturating fold replaced
               by a plain jnp.sum (MEASUREMENT ONLY, not bit-exact):
               isolates the accumulation share of the step
  nonorm    -- slices backward with the per-sample normalize/round/cast
               chains stubbed to plain casts (MEASUREMENT ONLY):
               isolates the f32 normalization share

Usage: ab_backward.py [B] [ITERS]
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

from microflow_tpu.train import compile_tflite_train, gradients, optimizer

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 30

m = compile_tflite_train("models/person_detect.tflite", 10, "crossentropy", True)
g = m.graph
rng = np.random.default_rng(0)
xq0 = jax.device_put(jnp.asarray(
    rng.integers(-128, 128, (B, *g.input_shape), np.int64), jnp.int8))
gt = jax.device_put(m.quantize_target(
    rng.uniform(0, 1, (B, *g.output_shape)).astype(np.float32)))


def run(name):
    def chain(params, gt_q, xq, grads):
        def step(_, carry):
            xq, grads = carry
            final, _loss, grads = m._train_step(params, grads, xq, gt_q)
            bump = final.reshape(final.shape[0], -1)[:, :1].astype(xq.dtype)
            bump = bump.reshape(bump.shape + (1,) * (xq.ndim - 2))
            return (xq + bump).astype(xq.dtype), grads

        return lax.fori_loop(0, ITERS, step, (xq, grads))

    cfn = jax.jit(chain)
    t0 = time.time()
    xc, gr = cfn(m.params, gt, xq0, m.grads)
    _ = np.asarray(xc[(0,) * xc.ndim])
    comp = time.time() - t0
    best = None
    for _ in range(3):
        t0 = time.time()
        xc, gr = cfn(m.params, gt, xc, m.grads)
        _ = np.asarray(xc[(0,) * xc.ndim])
        dt = (time.time() - t0) / ITERS
        best = dt if best is None else min(best, dt)
    print(f"{name:<9} compile {comp:6.1f}s  {best*1e3:8.3f} ms/step "
          f"({B/best:12,.0f} samples/s)", flush=True)
    return best


orig_conv = gradients.conv_backward_sample
orig_dw = gradients.dwconv_backward_sample
orig_fold = optimizer.accumulate_gradient_4d_fold
orig_cast = gradients._sat_cast_nan0

t_slices = run("slices")

gradients.conv_backward_sample = gradients.conv_backward_sample_scatter
gradients.dwconv_backward_sample = gradients.dwconv_backward_sample_scatter
t_scatter = run("scatter")
gradients.conv_backward_sample = orig_conv
gradients.dwconv_backward_sample = orig_dw

optimizer.accumulate_gradient_4d_fold = lambda dW_b, acc: acc + jnp.sum(
    dW_b.astype(jnp.int32), axis=0)
t_noaccum = run("noaccum")
optimizer.accumulate_gradient_4d_fold = orig_fold

gradients._sat_cast_nan0 = lambda x, dtype: x.astype(dtype)
t_nonorm = run("nonorm")
gradients._sat_cast_nan0 = orig_cast

print(f"\nattribution @B={B}:")
print(f"  scatter->slices backward delta: {(t_scatter-t_slices)*1e3:+.3f} ms")
print(f"  serial-fold share (slices - noaccum): {(t_slices-t_noaccum)*1e3:.3f} ms")
print(f"  norm/round/cast share (slices - nonorm): {(t_slices-t_nonorm)*1e3:.3f} ms")
