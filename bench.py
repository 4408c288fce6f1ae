#!/usr/bin/env python
"""Flagship benchmark: person_detect (MobileNet-v1 0.25x int8) throughput.

Prints ONE JSON line to stdout:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference MicroFlow Rust engine's best per-chip rate,
896,216 us per inference on an nRF52840 (BASELINE.md) = 1.1158 inf/s.
Diagnostics (per-batch latency, MACs/s, parity check) go to stderr.
"""

import argparse
import json
import sys
import time

import numpy as np


def log(*args):
    print(*args, file=sys.stderr, flush=True)


BASELINE_INF_PER_S = 1.0 / 0.896216  # person_detect, nRF52840, BASELINE.md

# Rust-reference goldens (tests/{sine,speech,person_detect}.rs), keyed by
# model *name* so user models with colliding input shapes are never
# mis-compared (a (96,96,1) user model must not be judged against the
# person_detect golden).
GOLDENS = {
    "sine": (np.array([[0.5]], np.float32),
             np.array([[0.41348344]], np.float32)),
    "speech": (np.full((1, 1960), 0.5, np.float32),
               np.array([[0.15625, 0.2734375, 0.2734375, 0.296875]], np.float32)),
    "person_detect": (np.full((1, 96, 96, 1), 0.5, np.float32),
                      np.array([[0.8046875, 0.1953125]], np.float32)),
}


def select_golden(model_name, input_shape):
    """Return (input, expected) for a bundled model, else None."""
    entry = GOLDENS.get(model_name)
    if entry is not None and entry[0].shape[1:] == tuple(input_shape):
        return entry
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="models/person_detect.tflite")
    # batch 49152 is the measured throughput peak for the flat kernel
    # (docs/PERFORMANCE.md round-3 sweep: 928k@6144 -> 948k@24576 ->
    # 952k@49152; 98304 adds +0.17% for 2x the compile); sustained
    # serialized iterations settle device clocks (80 iters reads ~3%
    # low -- clocks keep ramping past it; 200 measured 823k vs 746k at
    # 40 on the same chip)
    ap.add_argument("--batch", type=int, default=49152)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--backend", default=None, help="pallas|xla (default: auto)")
    ap.add_argument("--smoke", action="store_true",
                    help="CI smoke: small batch, few iters, xla backend "
                         "(skips the ~4 min Mosaic compile); still prints "
                         "the one JSON line")
    args = ap.parse_args()
    if args.smoke:
        args.batch, args.iters = 2048, 20
        args.backend = args.backend or "xla"

    import jax
    import jax.numpy as jnp

    # persistent executable cache: the flat whole-network kernel costs
    # ~4-8 min of (remote) compile; caching keyed on HLO makes repeat
    # bench runs start in seconds.  Opt out with MFT_NO_COMPILE_CACHE=1.
    import os
    if not os.environ.get("MFT_NO_COMPILE_CACHE"):
        from microflow_tpu.utils import enable_compile_cache

        enable_compile_cache()

    from microflow_tpu import compile_tflite
    from microflow_tpu.utils.flops import macs_per_inference

    log(f"backend: {jax.default_backend()} devices: {jax.devices()}")
    model_name = os.path.splitext(os.path.basename(args.model))[0]
    model = compile_tflite(args.model, name=model_name, backend=args.backend)
    macs = macs_per_inference(model.graph)
    log(f"model: {args.model} ({len(model.graph.layers)} layers, {macs/1e6:.2f} MMACs/inference)")

    use_exe_cache = not os.environ.get("MFT_NO_COMPILE_CACHE")
    if use_exe_cache:
        from microflow_tpu.utils import cached_executable

    # parity guard: golden output must match the Rust reference bit-for-bit
    entry = select_golden(model_name, model.graph.input_shape)
    if entry is not None:
        gin, expected = entry
        if use_exe_cache:
            model.warm(np.asarray(gin).shape[0])
        golden = np.asarray(model.predict(gin))
        if not np.array_equal(golden, expected):
            log(f"PARITY FAILURE ({model_name}): {golden} != {expected}")
            print(json.dumps({"metric": f"{model_name}_parity", "value": 0, "unit": "bool", "vs_baseline": 0}))
            return 1
        log(f"parity: {model_name} golden output bit-exact vs Rust reference")
    else:
        log("parity: no golden for this model (skipped)")

    # NOTE: under the axon relay, block_until_ready() returns before remote
    # execution completes, so we (a) chain each batch's input on the
    # previous output to force serialization and (b) end with a scalar
    # host readback as the true barrier.
    def chain_fn(params, xq):
        yq = model._forward(params, xq)
        bump = yq.reshape(yq.shape[0], -1)[:, :1]
        bump = bump.reshape(bump.shape + (1,) * (xq.ndim - bump.ndim))
        return (xq + bump).astype(xq.dtype), yq

    B = args.batch
    key = jax.random.PRNGKey(0)
    xq = jax.random.randint(key, (B, *model.graph.input_shape), -128, 128, dtype=jnp.int8)
    xq = jax.device_put(xq)

    # warmup / compile: the engine's executable-level cache keys only on
    # the lowered HLO, so a repeat bench of unchanged code starts in
    # seconds even when JAX's own cache key drifts (utils/cache.py)
    t0 = time.time()
    if use_exe_cache:
        chain = cached_executable(chain_fn, model.params, xq,
                                  name=f"bench_{model_name}_{B}")
    else:
        chain = jax.jit(chain_fn)
    x, y = chain(model.params, xq)
    _ = int(y.reshape(-1)[0])
    log(f"compile+warmup: {time.time()-t0:.1f}s (batch={B})")

    # steady-state wall throughput over a serialized chain of batches
    t0 = time.time()
    for _ in range(args.iters):
        x, y = chain(model.params, x)
    _ = int(y.reshape(-1)[0])  # host readback = real barrier
    dt = (time.time() - t0) / args.iters
    inf_per_s = B / dt
    log(
        f"batch={B}: {dt*1e3:.3f} ms/batch, {inf_per_s:,.0f} inf/s/chip, "
        f"{macs*inf_per_s/1e12:.2f} TMAC/s ({2*macs*inf_per_s/394e12*100:.1f}% of v5e int8 peak)"
    )

    print(
        json.dumps(
            {
                "metric": f"{model_name}_inferences_per_sec_per_chip",
                "value": round(inf_per_s, 1),
                "unit": "inferences/s",
                "vs_baseline": round(inf_per_s / BASELINE_INF_PER_S, 1),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
