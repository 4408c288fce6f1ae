#!/usr/bin/env python
"""Where-the-time-goes attribution of the jitted train step (TPU).

ITERS steps run INSIDE one jit (lax.fori_loop, data-dependent carry)
and the barrier reads back ONE device-sliced element: per-dispatch
relay overhead scales with argument/result arity (a grads-tree-carrying
step costs ~10 ms/dispatch) and a full-array readback ships megabytes
through the ~3 MB/s tunnel -- both swamp device time at small batches
(CLAUDE.md; this script's round-4 history is the cautionary tale).

Variants (reference analog: the per-sample host loop of
``examples/speech_train.rs:76-93`` + ``src/update_layer.rs:261-294``):

* fwd     -- forward pass only (all layers)
* full    -- the production train step: forward + per-sample backward +
             serial saturating fold (optimizer.accumulate_gradient_4d_fold)
* batched -- forward + backward + the vectorized overflow-guarded
             cumsum accumulation (measured-rejected: 0.49-0.55x full)

full - fwd    = backward + accumulation;
batched - full = the cumsum form's cost over the serial fold.

Usage: profile_train.py [B] [ITERS] [model] [n_layers] [loss]
"""

import os
import sys
import time

sys.path.insert(0, os.path.normpath(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

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


def fwd_fn(params, grads, xq, gt_q):
    x = xq
    from microflow_tpu.compiler.builder import apply_layer
    for layer in g.layers:
        x = apply_layer(layer, params, x, m.backend)
    return x


def make_chain(body, with_grads):
    """ITERS repeats of the step INSIDE one jit via lax.fori_loop with a
    data-dependent carry (per CLAUDE.md: host-visible per-dispatch relay
    overhead scales with the argument/result arity -- a train step
    carrying a 10-layer grads tree costs ~10 ms/dispatch through the
    tunnel, swamping the device time at small batches)."""

    def run(params, gt_q, xq, grads):
        def step(_, carry):
            xq, grads = carry
            if with_grads:
                final, _loss, grads = body(params, grads, xq, gt_q)
            else:
                final = body(params, grads, xq, gt_q)
            bump = final.reshape(final.shape[0], -1)[:, :1].astype(jnp.int8)
            bump = bump.reshape(bump.shape + (1,) * (xq.ndim - 2))
            return (xq + bump).astype(xq.dtype), grads

        return lax.fori_loop(0, ITERS, step, (xq, grads))

    return jax.jit(run)


import functools

# "full" is the PRODUCTION path: predict_quantized_train proves the
# no-clamp bound host-side (grads zeroed at update; 127*B*ITERS here =
# well under 2**31) and traces the step with fold_mode="fast" -- plain
# sums, no cond.  "checked" is the runtime-cond fallback path.
fast_step = functools.partial(m._train_step, fold_mode="fast")
assert 127 * B * ITERS < 2**31, "bound proof precondition"
variants = [("fwd", make_chain(fwd_fn, False)),
            ("full", make_chain(fast_step, True)),
            ("checked", make_chain(m._train_step, True))]
# jit traces lazily, so the batched variant must be TRACED (not just
# wrapped) while the monkeypatch is active -- lower() forces it
orig = optimizer.accumulate_gradient_4d_fold_many
optimizer.accumulate_gradient_4d_fold_many = lambda pairs: [
    optimizer.accumulate_gradient_4d_batch(d, a) for d, a in pairs]
try:
    batched_lowered = make_chain(m._train_step, True).lower(
        m.params, gt, xq0, m.grads)
finally:
    optimizer.accumulate_gradient_4d_fold_many = orig
batched_exe = batched_lowered.compile()
variants.append(("batched", lambda *a: batched_exe(*a)))

results = {}
for name, chain in variants:
    t0 = time.time()
    x, gr = chain(m.params, gt, xq0, m.grads)
    # host-readback barrier on ONE element, sliced on device -- pulling
    # the whole [B,96,96,1] carry through the ~3 MB/s relay tunnel adds
    # ~4 ms/iter at ITERS=50 and swamps the attribution (CLAUDE.md)
    _ = int(np.asarray(x[(0,) * x.ndim]))
    comp = time.time() - t0
    best = None
    for rep in range(3):
        t0 = time.time()
        x, gr = chain(m.params, gt, x, m.grads)
        _ = int(np.asarray(x[(0,) * x.ndim]))
        dt = (time.time() - t0) / ITERS * 1e3
        best = dt if best is None else min(best, dt)
    results[name] = best
    print(f"{name:<7} compile {comp:5.1f}s  {best:8.3f} ms/batch "
          f"({B / best * 1e3:,.0f} samples/s)", flush=True)

if {"fwd", "full", "checked", "batched"} <= results.keys():
    fwd, full = results["fwd"], results["full"]
    checked, batched = results["checked"], results["batched"]
    print(f"\nattribution @batch {B} ({MODEL}, {NL} trained layers):")
    print(f"  forward                 {fwd:8.3f} ms ({fwd/full*100:4.1f}% of full)")
    print(f"  backward + fast fold    {full-fwd:8.3f} ms")
    print(f"  cond-guard penalty      {checked-full:8.3f} ms "
          f"(runtime-checked step = {checked:.3f} ms)")
    print(f"  cumsum-accum penalty    {batched-full:8.3f} ms "
          f"(batched step = {batched:.3f} ms -> {full/batched:.2f}x of full)")
