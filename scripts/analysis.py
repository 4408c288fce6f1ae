#!/usr/bin/env python
"""Analysis harness (reference ``analysis/`` directory equivalent).

Produces CSV artifacts under ``analysis/data/``:

* ``latency.csv``  -- person_detect latency/throughput vs batch size on
  the current device (the reference's ``performance/data/*.csv`` analog);
* ``parity.csv``   -- max |delta| in output LSB between the engine's
  backends per model (the reference's ``accuracy/data/*.csv`` analog;
  0 = bit-exact).

Run on TPU: ``python scripts/analysis.py``.
"""

import csv
import os
import sys
import time

import numpy as np

ROOT = os.path.normpath(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, ROOT)
OUT = os.path.join(ROOT, "analysis", "data")
os.makedirs(OUT, exist_ok=True)


def latency_sweep():
    """All three bundled models (reference benches/{sine,speech,
    person_detect}.rs analog), throughput vs batch on the current device."""
    import jax
    import jax.numpy as jnp

    from microflow_tpu import compile_tflite

    cases = [
        ("sine", (1,), (1024, 16384, 131072, 524288)),
        # 32768 is speech's measured throughput peak (65536/131072 dip)
        ("speech", (1960,), (256, 1024, 4096, 16384, 32768)),
        # flat (the TPU default since round 3) Mosaic-compiles ~4 min
        # per distinct batch shape; sweep the serving-relevant sizes
        # plus the bench peak (24576, docs/PERFORMANCE.md round-3 sweep)
        ("person_detect", (96, 96, 1), (1024, 4096, 6144, 24576)),
    ]
    from microflow_tpu.utils import cached_executable, enable_compile_cache

    enable_compile_cache()
    rows = []
    for name, shape, batches in cases:
        model = compile_tflite(os.path.join(ROOT, "models", f"{name}.tflite"), name=name)
        for batch in batches:
            def chain_fn(params, xq):
                yq = model._forward(params, xq)
                bump = yq.reshape(yq.shape[0], -1)[:, :1]
                bump = bump.reshape(bump.shape + (1,) * (xq.ndim - bump.ndim))
                return (xq + bump).astype(xq.dtype), yq

            xq = jax.device_put(
                jax.random.randint(jax.random.PRNGKey(0), (batch, *shape), -128, 128, dtype=jnp.int8)
            )
            # engine-level executable cache; the name matches bench.py's
            # so the sweep and the bench share compiled entries
            chain = cached_executable(chain_fn, model.params, xq,
                                      name=f"bench_{name}_{batch}")
            x, y = chain(model.params, xq)
            _ = int(y.reshape(-1)[0])
            # bench-grade settling: 200 serialized iterations match
            # bench.py's methodology (fewer reads up to 25% low -- the
            # device clocks keep ramping; see docs/PERFORMANCE.md);
            # total sweep measurement time is still ~10 s
            iters = 200
            t0 = time.time()
            for _ in range(iters):
                x, y = chain(model.params, x)
            _ = int(y.reshape(-1)[0])
            dt = (time.time() - t0) / iters
            rows.append((name, batch, dt * 1e6, batch / dt))
            print(f"{name:<14} batch {batch:>7}: {dt*1e3:8.3f} ms  {batch/dt:14,.0f} inf/s", file=sys.stderr)

    with open(os.path.join(OUT, "latency.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["model", "batch", "latency_us", "inferences_per_s"])
        for r in rows:
            w.writerow([r[0], r[1], f"{r[2]:.1f}", f"{r[3]:.0f}"])


def train_sweep(cases=None, iters: int = 50):
    """Train-step throughput: fwd + bwd + gradient accumulation as one
    jitted batch, plus the weight update (the reference trains one
    sample per loop iteration, ``examples/speech_train.rs:76-93``).
    Steps serialize naturally -- each chains on the device-resident
    gradient pytree -- so wall timing is relay-safe."""
    import jax

    from microflow_tpu import models

    if cases is None:
        cases = [
            ("sine", models.sine_trainable, (1,), 4096),
            ("speech", models.speech_trainable, (1960,), 1024),
            ("person_detect", models.person_detect_trainable, (96, 96, 1), 256),
        ]
    rng = np.random.default_rng(7)
    rows = []
    for name, ctor, shape, batch in cases:
        m = ctor()
        x = rng.uniform(-1, 1, (batch, *shape)).astype(np.float32)
        xq = m.quantize_input(x)
        gt_q = m.quantize_target(rng.uniform(0, 1, (batch, *m.graph.output_shape)).astype(np.float32))
        m.predict_quantized_train(xq, gt_q, 0.01)  # compile + warm
        m.update_layers(batch, 0.01)
        _ = np.asarray(jax.tree_util.tree_leaves(m.grads)[0]).ravel()[0]
        t0 = time.time()
        for _ in range(iters):
            m.predict_quantized_train(xq, gt_q, 0.01)
        m.update_layers(batch, 0.01)
        _ = np.asarray(jax.tree_util.tree_leaves(m.grads)[0]).ravel()[0]
        dt = (time.time() - t0) / iters
        rows.append((name, batch, dt * 1e6, batch / dt))
        print(f"train {name:<14} batch {batch:>5}: {dt*1e3:8.3f} ms/step  "
              f"{batch/dt:12,.0f} samples/s", file=sys.stderr)

    with open(os.path.join(OUT, "train.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["model", "batch", "step_latency_us", "samples_per_s"])
        for r in rows:
            w.writerow([r[0], r[1], f"{r[2]:.1f}", f"{r[3]:.0f}"])


def parity_report():
    from microflow_tpu import compile_tflite

    cases = [("sine", (8, 1)), ("speech", (2, 1960)), ("person_detect", (2, 96, 96, 1))]
    rows = []
    rng = np.random.default_rng(1)
    for name, shape in cases:
        path = os.path.join(ROOT, "models", f"{name}.tflite")
        ref = compile_tflite(path, backend="xla")
        xq = rng.integers(-128, 128, shape, dtype=np.int8)
        base = np.asarray(ref.predict_inner(xq)).astype(np.int32)
        for backend in ("pallas", "fused", "flat"):
            try:
                alt = compile_tflite(path, backend=backend)
            except ValueError:
                continue  # backend's planner rejects this graph (e.g. flat on FC models)
            got = np.asarray(alt.predict_inner(xq)).astype(np.int32)
            delta = int(np.abs(base - got).max())
            rows.append((name, backend, delta))
            print(f"{name:<14} {backend:<7} max|delta| = {delta} LSB", file=sys.stderr)

    with open(os.path.join(OUT, "parity.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["model", "backend", "max_delta_lsb_vs_xla"])
        w.writerows(rows)


if __name__ == "__main__":
    parity_report()
    latency_sweep()
    train_sweep()
