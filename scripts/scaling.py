#!/usr/bin/env python
"""Multi-device scaling artifact (BASELINE.md north-star scaling column).

Weak-scaling sweep over a virtual CPU device mesh (1/2/4/8 devices,
fixed per-device batch) writing ``analysis/data/scaling.csv``:

* ``sharded_inf_per_s``   -- DP (batch-sharded) execution over the mesh;
* ``unsharded_inf_per_s`` -- the same TOTAL batch on one device;
* ``overhead_pct``        -- sharding overhead at equal total work;
* ``bit_equal``           -- sharded output bit-identical to unsharded;
* ``server_bit_equal``    -- BatchServer over the same mesh returns
  per-request results bit-identical to direct predict.

Virtual devices share this host's physical cores, so wall-clock speedup
is NOT measurable here (the driver host has a single core); what IS
measurable -- and what linear scaling on real chips reduces to -- is
(a) zero sharding overhead at equal total batch (the DP forward
compiles to collective-free per-device compute) and (b) bit-equality.
The real-chip scaling claim follows: per-chip work is independent and
identical, so N chips do N x the throughput.

Run: ``python scripts/scaling.py`` (re-execs itself onto the virtual
CPU backend; the ambient axon/TPU env is scrubbed automatically).
"""

import csv
import os
import subprocess
import sys
import time

ROOT = os.path.normpath(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
OUT = os.path.join(ROOT, "analysis", "data")
N_DEVICES = 8


def reexec_on_cpu_mesh():
    """Re-exec under a scrubbed env with an 8-device virtual CPU backend
    (the axon relay forces its own platform unless PYTHONPATH is reset)."""
    env = {k: v for k, v in os.environ.items() if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = ROOT
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={N_DEVICES}"
    env["MFT_SCALING_CHILD"] = "1"
    os.execve(sys.executable, [sys.executable, os.path.abspath(__file__)], env)


def main():
    import jax
    import numpy as np

    from microflow_tpu import compile_tflite
    from microflow_tpu.parallel import BatchServer, replicate_params, shard_batch
    from microflow_tpu.parallel.mesh import Mesh, batch_sharding, replicated

    devices = jax.devices()
    assert len(devices) >= N_DEVICES, devices

    cases = [("speech", (1960,), 64, 40), ("person_detect", (96, 96, 1), 8, 4)]
    rows = []
    for name, shape, per_dev_batch, iters in cases:
        model = compile_tflite(os.path.join(ROOT, "models", f"{name}.tflite"), name=name)
        rng = np.random.default_rng(0)
        for n in (1, 2, 4, 8):
            mesh = Mesh(np.asarray(devices[:n]).reshape(n, 1), axis_names=("data", "model"))
            B = per_dev_batch * n
            xq = rng.integers(-128, 128, size=(B, *shape)).astype(np.int8)

            # unsharded reference: same total batch on device 0
            f1 = jax.jit(model._predict_from_quantized, device=devices[0])
            y1 = np.asarray(f1(model.params, xq))
            t0 = time.time()
            for _ in range(iters):
                f1(model.params, xq)[0].block_until_ready()
            t_un = (time.time() - t0) / iters

            # DP-sharded over the n-device mesh
            params = replicate_params(mesh, model.params)
            fs = jax.jit(
                model._predict_from_quantized,
                in_shardings=(replicated(mesh), batch_sharding(mesh, xq.ndim)),
                out_shardings=batch_sharding(mesh, y1.ndim),
            )
            xs = shard_batch(mesh, xq)
            ys = np.asarray(fs(params, xs))
            t0 = time.time()
            for _ in range(iters):
                fs(params, xs)[0].block_until_ready()
            t_sh = (time.time() - t0) / iters

            bit_equal = bool(np.array_equal(ys, y1))

            # BatchServer over the same mesh
            server = BatchServer(model, mesh=mesh, max_batch=B, max_wait_ms=1.0)
            try:
                xf = rng.uniform(-1, 1, size=(6, *shape)).astype(np.float32)
                got = np.asarray(server.predict(xf))
                want = np.asarray(model.predict(xf))
                server_bit_equal = bool(np.array_equal(got, want))
            finally:
                server.stop()

            overhead = (t_sh / t_un - 1.0) * 100.0
            rows.append(
                (name, n, per_dev_batch, B, f"{B/t_sh:.0f}", f"{B/t_un:.0f}",
                 f"{overhead:.1f}", bit_equal, server_bit_equal)
            )
            print(
                f"{name:<14} n={n}: sharded {B/t_sh:>10,.0f} inf/s, unsharded {B/t_un:>10,.0f} "
                f"inf/s, overhead {overhead:+.1f}%, bit_equal={bit_equal}, server={server_bit_equal}",
                file=sys.stderr,
            )

    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "scaling.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(
            ["model", "n_devices", "per_device_batch", "total_batch",
             "sharded_inf_per_s", "unsharded_inf_per_s", "sharding_overhead_pct",
             "bit_equal", "server_bit_equal"]
        )
        w.writerows(rows)
    print(f"wrote {os.path.join(OUT, 'scaling.csv')}", file=sys.stderr)


if __name__ == "__main__":
    if os.environ.get("MFT_SCALING_CHILD") != "1":
        reexec_on_cpu_mesh()
    main()
