#!/usr/bin/env python
"""Where-the-time-goes attribution of the jitted train step (TPU).

Chained-dispatch methodology per CLAUDE.md (grads carried through the
chain, input bumped by a data-dependent byte, host readback barrier).
Variants isolate the three phases the round-3 verdict asked to
attribute (reference analog: the per-sample host loop of
``examples/speech_train.rs:76-93`` + ``src/update_layer.rs:261-294``):

* fwd        -- forward pass only (all layers, acts saved)
* full       -- forward + backward + batched saturating accumulation
                (optimizer.accumulate_gradient_4d_batch, round 4)
* serial     -- forward + backward + the pre-round-4 per-sample
                fori_loop accumulation (the reference's literal fold)

full - fwd   = backward + accumulation;
serial - full = the serial fold's cost over the batched one.

Usage: profile_train.py [B] [ITERS] [model] [n_layers] [loss]
"""

import os
import sys
import time

sys.path.insert(0, os.path.normpath(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")))

import jax
import jax.numpy as jnp
import numpy as np

from microflow_tpu.train import compile_tflite_train, optimizer

args = sys.argv[1:]
B = int(args[0]) if args else 256
ITERS = int(args[1]) if len(args) > 1 else 30
MODEL = args[2] if len(args) > 2 else "models/person_detect.tflite"
NL = int(args[3]) if len(args) > 3 else 10
LOSS = args[4] if len(args) > 4 else "crossentropy"

m = compile_tflite_train(MODEL, NL, LOSS, True)
g = m.graph
IN_SHAPE = tuple(g.input_shape)
rng = np.random.default_rng(0)
xq0 = jax.device_put(jnp.asarray(
    rng.integers(-128, 128, (B, *IN_SHAPE), np.int64), jnp.int8))
gt = jax.device_put(m.quantize_target(
    rng.uniform(0, 1, (B, *g.output_shape)).astype(np.float32)))


def serial_accum(dW_b, acc):
    return jax.lax.fori_loop(
        0, dW_b.shape[0],
        lambda i, a: optimizer.accumulate_gradient_4d(dW_b[i], a), acc)


def fwd_fn(params, grads, xq, gt_q):
    x = xq
    from microflow_tpu.compiler.builder import apply_layer
    for layer in g.layers:
        x = apply_layer(layer, params, x, m.backend)
    return x


def make_chain(body, with_grads):
    def run(params, grads, xq, gt_q):
        if with_grads:
            final, loss_out, new_grads = body(params, grads, xq, gt_q)
        else:
            final = body(params, grads, xq, gt_q)
            new_grads = grads
        bump = final.reshape(final.shape[0], -1)[:, :1].astype(jnp.int8)
        bump = bump.reshape(bump.shape + (1,) * (xq.ndim - 2))
        return (xq + bump).astype(xq.dtype), new_grads

    return jax.jit(run)


variants = [("fwd", make_chain(fwd_fn, False)),
            ("full", make_chain(m._train_step, True))]
orig = optimizer.accumulate_gradient_4d_batch
optimizer.accumulate_gradient_4d_batch = serial_accum
try:
    variants.append(("serial", make_chain(m._train_step, True)))
finally:
    optimizer.accumulate_gradient_4d_batch = orig

results = {}
for name, chain in variants:
    t0 = time.time()
    x, gr = chain(m.params, m.grads, xq0, gt)
    _ = int(np.asarray(x).reshape(-1)[0])
    comp = time.time() - t0
    best = None
    for rep in range(3):
        t0 = time.time()
        for _ in range(ITERS):
            x, gr = chain(m.params, m.grads, x, gt)
        _ = int(np.asarray(x).reshape(-1)[0])
        dt = (time.time() - t0) / ITERS * 1e3
        best = dt if best is None else min(best, dt)
    results[name] = best
    print(f"{name:<7} compile {comp:5.1f}s  {best:8.3f} ms/batch "
          f"({B / best * 1e3:,.0f} samples/s)", flush=True)

if {"fwd", "full", "serial"} <= results.keys():
    fwd, full, serial = results["fwd"], results["full"], results["serial"]
    print(f"\nattribution @batch {B} ({MODEL}, {NL} trained layers):")
    print(f"  forward               {fwd:8.3f} ms ({fwd/full*100:4.1f}% of full)")
    print(f"  backward+accum (batched) {full-fwd:8.3f} ms")
    print(f"  serial-fold penalty   {serial-full:8.3f} ms "
          f"(serial step = {serial:.3f} ms -> batched accum is "
          f"{serial/full:.2f}x)")
