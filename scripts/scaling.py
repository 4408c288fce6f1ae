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

    # Self-describing cells (round-4 VERDICT task 6): the virtual devices
    # share one host core, so absolute inf/s and cross-n speedup are not
    # performance numbers here; each row's note says what IS the metric.
    NOTE_FWD = ("virtual 1-core mesh: metric is overhead at equal total "
                "work + bit-equality, not absolute inf/s")
    NOTE_TRAIN = ("virtual 1-core mesh: wall-clock meaningless, "
                  "unsharded/overhead cells intentionally empty; metric is "
                  "bit-equality of outputs and updated params")

    cases = [("speech", (1960,), 64, 40), ("person_detect", (96, 96, 1), 8, 4)]
    rows = []  # (model, mode, n_devices, per_dev_batch, total, sharded/s,
    #            unsharded/s, overhead_pct, bit_equal, server_bit_equal)
    for name, shape, per_dev_batch, iters in cases:
        model = compile_tflite(os.path.join(ROOT, "models", f"{name}.tflite"), name=name)
        rng = np.random.default_rng(0)
        for n in (1, 2, 4, 8):
            mesh = Mesh(np.asarray(devices[:n]).reshape(n, 1), axis_names=("data", "model"))
            B = per_dev_batch * n
            xq = rng.integers(-128, 128, size=(B, *shape)).astype(np.int8)

            def best_of(fn, reps=3):
                """min over reps: the 1-core host is contended, so a
                single rep can read 50%+ high; min-of-3 is stable."""
                best = None
                for _ in range(reps):
                    t0 = time.time()
                    fn()
                    dt = time.time() - t0
                    best = dt if best is None else min(best, dt)
                return best / iters

            # unsharded reference: same total batch on device 0
            f1 = jax.jit(model._predict_from_quantized, device=devices[0])
            y1 = np.asarray(f1(model.params, xq))

            def run_un():
                for _ in range(iters):
                    f1(model.params, xq)[0].block_until_ready()

            t_un = best_of(run_un)

            # DP-sharded over the n-device mesh
            params = replicate_params(mesh, model.params)
            fs = jax.jit(
                model._predict_from_quantized,
                in_shardings=(replicated(mesh), batch_sharding(mesh, xq.ndim)),
                out_shardings=batch_sharding(mesh, y1.ndim),
            )
            xs = shard_batch(mesh, xq)
            ys = np.asarray(fs(params, xs))

            def run_sh():
                for _ in range(iters):
                    fs(params, xs)[0].block_until_ready()

            t_sh = best_of(run_sh)

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
                (name, "dp_forward", n, per_dev_batch, B, f"{B/t_sh:.0f}",
                 f"{B/t_un:.0f}", f"{overhead:.1f}", bit_equal,
                 server_bit_equal, NOTE_FWD)
            )
            print(
                f"{name:<14} n={n}: sharded {B/t_sh:>10,.0f} inf/s, unsharded {B/t_un:>10,.0f} "
                f"inf/s, overhead {overhead:+.1f}%, bit_equal={bit_equal}, server={server_bit_equal}",
                file=sys.stderr,
            )

    # --- serving-batch speech row (BASELINE.md: "overhead vanishes at
    # serving batch sizes" -- substantiate it with a measured row) -----
    model = compile_tflite(os.path.join(ROOT, "models", "speech.tflite"), name="speech")
    rng = np.random.default_rng(0)
    n, per_dev = N_DEVICES, 2048
    mesh = Mesh(np.asarray(devices[:n]).reshape(n, 1), axis_names=("data", "model"))
    B = per_dev * n
    xq = rng.integers(-128, 128, size=(B, 1960)).astype(np.int8)
    f1 = jax.jit(model._predict_from_quantized, device=devices[0])
    y1 = np.asarray(f1(model.params, xq))

    def best3(fn):
        best = None
        for _ in range(3):
            t0 = time.time()
            for _ in range(3):
                fn()
            dt = (time.time() - t0) / 3
            best = dt if best is None else min(best, dt)
        return best

    t_un = best3(lambda: f1(model.params, xq)[0].block_until_ready())
    params = replicate_params(mesh, model.params)
    fs = jax.jit(model._predict_from_quantized,
                 in_shardings=(replicated(mesh), batch_sharding(mesh, 2)),
                 out_shardings=batch_sharding(mesh, 2))
    xs = shard_batch(mesh, xq)
    ys = np.asarray(fs(params, xs))
    t_sh = best3(lambda: fs(params, xs)[0].block_until_ready())
    overhead = (t_sh / t_un - 1.0) * 100.0
    rows.append(("speech", "dp_forward_serving", n, per_dev, B, f"{B/t_sh:.0f}",
                 f"{B/t_un:.0f}", f"{overhead:.1f}",
                 bool(np.array_equal(ys, y1)), "", NOTE_FWD))
    print(f"speech serving n={n} B={B}: overhead {overhead:+.1f}%, "
          f"bit_equal={np.array_equal(ys, y1)}", file=sys.stderr)

    # --- TP forward + TP/DP train-step rows (round-2 VERDICT weak #7;
    # person_detect rows round-4 VERDICT task 6) ------------------------
    from jax.sharding import NamedSharding, PartitionSpec as P

    from microflow_tpu.parallel import shard_params
    from microflow_tpu.train import compile_tflite_train

    def train_rows(mode, n_data, n_model, model_name="speech",
                   shape=(1960,), n_layers=2, n_out=4, per_dev=8, iters=10):
        n = n_data * n_model
        mesh = Mesh(np.asarray(devices[:n]).reshape(n_data, n_model),
                    axis_names=("data", "model"))
        m = compile_tflite_train(
            os.path.join(ROOT, "models", f"{model_name}.tflite"),
            n_layers, "crossentropy", True, name=model_name)
        B = per_dev * n_data
        rng = np.random.default_rng(1)
        xq = rng.integers(-128, 128, size=(B, *shape)).astype(np.int8)
        gt = np.full((B, n_out), -128, np.int8)
        gt[np.arange(B), rng.integers(0, n_out, B)] = 127

        # unsharded reference step on device 0
        d0 = devices[0]
        p1 = jax.device_put(m.params, d0)
        g1 = jax.device_put(m.grads, d0)
        final1, _, g1 = jax.jit(m._train_step)(p1, g1, jax.device_put(xq, d0),
                                               jax.device_put(gt, d0))
        p1, g1 = jax.jit(m._update_step, static_argnames=("batch_size", "lr"))(
            p1, g1, batch_size=B, lr=0.5)

        # sharded: batch over data, TP policy over model axis
        pol = "tp" if n_model > 1 else "replicate"
        ps = shard_params(mesh, m.params, policy=pol)
        gs = shard_params(mesh, m.grads, policy=pol)
        batch = NamedSharding(mesh, P("data"))
        xqs = jax.device_put(xq, batch)
        gts = jax.device_put(gt, batch)
        with mesh:
            tstep = jax.jit(m._train_step)
            ustep = jax.jit(m._update_step, static_argnames=("batch_size", "lr"))
            final2, _, gs = tstep(ps, gs, xqs, gts)
            ps, gs = ustep(ps, gs, batch_size=B, lr=0.5)
            jax.block_until_ready((final2, ps))
            t0 = time.time()
            for _ in range(iters):
                f3, _, g3 = tstep(ps, gs, xqs, gts)
            jax.block_until_ready(f3)
            t_sh = (time.time() - t0) / iters

        eq_out = bool(np.array_equal(np.asarray(final1), np.asarray(final2)))
        eq_par = all(
            bool(np.array_equal(np.asarray(a), np.asarray(b)))
            for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(ps)))
        rows.append((model_name, mode, n, per_dev, B, f"{B/t_sh:.0f}", "",
                     "", eq_out and eq_par, "", NOTE_TRAIN))
        print(f"{model_name} {mode} mesh=({n_data}x{n_model}): train-step "
              f"{B/t_sh:,.0f} inf/s, out+updated-params bit_equal="
              f"{eq_out and eq_par}", file=sys.stderr)

        # TP forward bit-equality on the inference path
        if n_model > 1:
            mf = compile_tflite(
                os.path.join(ROOT, "models", f"{model_name}.tflite"),
                name=model_name)
            want = np.asarray(jax.jit(mf._predict_from_quantized, device=d0)(
                jax.device_put(mf.params, d0), jax.device_put(xq, d0)))
            pf = shard_params(mesh, mf.params, policy="tp")
            with mesh:
                got = np.asarray(jax.jit(mf._predict_from_quantized)(pf, xqs))
            rows.append((model_name, "tp_forward", n, per_dev, B, "", "", "",
                         bool(np.array_equal(got, want)), "", NOTE_TRAIN))
            print(f"{model_name} tp_forward mesh=({n_data}x{n_model}): bit_equal="
                  f"{np.array_equal(got, want)}", file=sys.stderr)

    train_rows("dp_train", N_DEVICES, 1)
    train_rows("tp_train", N_DEVICES // 2, 2)
    # flagship (bench-model) training coverage: person_detect, the
    # reference examples/person_detect_train.rs configuration (10 layers)
    train_rows("dp_train", N_DEVICES, 1, model_name="person_detect",
               shape=(96, 96, 1), n_layers=10, n_out=2, per_dev=4, iters=3)
    train_rows("tp_train", N_DEVICES // 2, 2, model_name="person_detect",
               shape=(96, 96, 1), n_layers=10, n_out=2, per_dev=4, iters=3)

    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "scaling.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(
            ["model", "mode", "n_devices", "per_device_batch", "total_batch",
             "sharded_inf_per_s", "unsharded_inf_per_s", "sharding_overhead_pct",
             "bit_equal", "server_bit_equal", "notes"]
        )
        w.writerows(rows)
    print(f"wrote {os.path.join(OUT, 'scaling.csv')}", file=sys.stderr)


if __name__ == "__main__":
    if os.environ.get("MFT_SCALING_CHILD") != "1":
        reexec_on_cpu_mesh()
    main()
