#!/usr/bin/env python
"""Quantify the collective/compute-overlap N/A (round-4 VERDICT task 9).

SURVEY.md 2.5 names collective/compute OVERLAP as a communication-backend
capability.  This script measures why overlap engineering has nothing to
buy on this model class: it compiles the speech TP train step on the
virtual 4x2 CPU mesh, walks the optimized HLO for every cross-device
collective (all-reduce / all-gather / reduce-scatter / collective-permute),
sums their payload bytes, and compares against the step's compute time
and the ICI transfer time those bytes would cost on real v5e hardware.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
     PYTHONPATH=. python scripts/collective_bytes.py
(or under the ambient relay env; it forces the CPU mesh itself).
"""

import os
import re
import sys
import time

sys.path.insert(0, os.path.normpath(os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..")))

import jax
import numpy as np

from microflow_tpu.parallel import shard_params
from microflow_tpu.parallel.mesh import batch_sharding, make_mesh
from microflow_tpu.train import compile_tflite_train

DTYPE_BYTES = {"f32": 4, "s32": 4, "u32": 4, "f16": 2, "bf16": 2,
               "s8": 1, "u8": 1, "pred": 1, "s64": 8, "f64": 8}

COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
               "collective-permute", "all-to-all")


def collective_bytes(hlo_text: str):
    """Sum payload bytes of every collective instruction in an optimized
    HLO module (shape of the RESULT; tuple shapes expanded)."""
    rows = []
    for line in hlo_text.splitlines():
        m = re.search(r"=\s*((?:\([^)]*\)|\S+))\s+(" + "|".join(COLLECTIVES) + r")", line)
        if not m:
            continue
        shapes, kind = m.group(1), m.group(2)
        total = 0
        for sm in re.finditer(r"(\w+)\[([\d,]*)\]", shapes):
            dt, dims = sm.group(1), sm.group(2)
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            total += n * DTYPE_BYTES.get(dt, 4)
        rows.append((kind, shapes, total))
    return rows


def main():
    mesh = make_mesh(n_data=4, n_model=2)
    m = compile_tflite_train("models/speech.tflite", 2, "crossentropy", True,
                             name="speech")
    B = 1024
    rng = np.random.default_rng(0)
    xq = rng.integers(-128, 128, size=(B, 1960)).astype(np.int8)
    gt = np.full((B, 4), -128, np.int8)
    gt[:, 1] = 127
    params_tp = shard_params(mesh, m.params, policy="tp")
    grads_tp = shard_params(mesh, m.grads, policy="tp")
    xq_s = jax.device_put(xq, batch_sharding(mesh, 2))
    gt_s = jax.device_put(gt, batch_sharding(mesh, 2))

    with mesh:
        step = jax.jit(m._train_step)
        lowered = step.lower(params_tp, grads_tp, xq_s, gt_s)
        compiled = lowered.compile()
        hlo = compiled.as_text()
        rows = collective_bytes(hlo)

        # timed steps on the virtual mesh (CPU; the RATIO collective
        # bytes : compute time is the quantity of interest, v5e ICI
        # bandwidth is applied analytically below)
        out = step(params_tp, grads_tp, xq_s, gt_s)
        jax.block_until_ready(out)
        t0 = time.time()
        N = 10
        for _ in range(N):
            out = step(params_tp, grads_tp, xq_s, gt_s)
            jax.block_until_ready(out)
        dt = (time.time() - t0) / N

    total = sum(r[2] for r in rows)
    print(f"TP train step, speech (2 trained layers), B={B}, mesh 4x2:")
    for kind, shapes, b in rows:
        print(f"  {kind:<20} {shapes:<40} {b:>10,} B")
    print(f"  total collective payload: {total:,} B/step")
    print(f"  virtual-mesh step time:   {dt*1e3:.2f} ms (CPU, 8 virtual devices)")
    ici = 45e9  # v5e per-link ICI ~45 GB/s each direction (1 of 4 links)
    t_coll = total / ici
    print(f"  at one v5e ICI link (45 GB/s): {t_coll*1e6:.2f} us of transfer")
    dev_ms = 1.61  # measured speech train step @1024 on v5e (train.csv r4)
    print(f"  vs measured v5e step time {dev_ms:.2f} ms @B=1024 -> "
          f"collectives are {t_coll*1e5/dev_ms:.4f}% of the step;")
    print("  overlap engineering has nothing to hide.  (docs/PERFORMANCE.md"
          " 'Multi-chip' carries this paragraph.)")

    # DP inference: batch-sharded forward, replicated weights -> must
    # compile to ZERO collectives
    from microflow_tpu import compile_tflite
    from microflow_tpu.parallel.mesh import replicate_params, replicated

    inf = compile_tflite("models/speech.tflite", name="speech")
    params_r = replicate_params(mesh, inf.params)
    fwd = jax.jit(inf._predict_from_quantized,
                  in_shardings=(replicated(mesh), batch_sharding(mesh, 2)),
                  out_shardings=batch_sharding(mesh, 2))
    with mesh:
        hlo_inf = fwd.lower(params_r, xq_s).compile().as_text()
    inf_rows = collective_bytes(hlo_inf)
    print(f"  DP inference collectives: {len(inf_rows)} "
          f"({sum(r[2] for r in inf_rows):,} B) -- expected 0")


if __name__ == "__main__":
    main()
