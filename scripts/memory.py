#!/usr/bin/env python
"""Memory-footprint analysis: the TPU analog of the reference's
``analysis/memory/plots`` (peak RAM per model on MCUs).

For each bundled model and backend, record to analysis/data/memory.csv:
  - params_bytes: weights + folded constants (the reference's flash)
  - logical_act_bytes: per-sample activation bytes (sum of layer outputs)
  - peak_hbm_bytes: XLA's compiled peak-memory estimate at batch 1024
    (argument + output + temp allocations from memory_analysis())
  - temp_hbm_bytes: scratch/temp portion alone

Run on the ambient TPU backend: `python scripts/memory.py`.
"""

import csv
import os
import sys

sys.path.insert(0, os.path.normpath(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")))

import jax
import jax.numpy as jnp
import numpy as np

from microflow_tpu import compile_tflite

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                   "analysis", "data", "memory.csv")
B = 1024


def tree_bytes(tree):
    return sum(np.asarray(x).nbytes for x in jax.tree_util.tree_leaves(tree))


rows = []
for name in ("sine", "speech", "person_detect"):
    model = compile_tflite(f"models/{name}.tflite", name=name)
    g = model.graph
    params_bytes = tree_bytes(model.params)
    logical_act = int(np.prod(g.input_shape)) * np.dtype(g.input_dtype).itemsize
    for layer in g.layers:
        out_shape = getattr(layer, "out_shape", None)
        if out_shape:
            logical_act += int(np.prod(out_shape))  # int8/uint8 = 1 byte

    xq = jnp.zeros((B, *g.input_shape), g.input_dtype)
    lowered = jax.jit(lambda p, x: model._forward(p, x)).lower(model.params, xq)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    peak = int(ma.argument_size_in_bytes + ma.output_size_in_bytes
               + ma.temp_size_in_bytes)
    rows.append(dict(
        model=name,
        params_bytes=params_bytes,
        logical_act_bytes_per_sample=logical_act,
        batch=B,
        peak_hbm_bytes=peak,
        temp_hbm_bytes=int(ma.temp_size_in_bytes),
        args_hbm_bytes=int(ma.argument_size_in_bytes),
    ))
    print(rows[-1], file=sys.stderr)

os.makedirs(os.path.dirname(OUT), exist_ok=True)
with open(OUT, "w", newline="") as f:
    w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
    w.writeheader()
    w.writerows(rows)
print(f"wrote {OUT}")
