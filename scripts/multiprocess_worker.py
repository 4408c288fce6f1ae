#!/usr/bin/env python
"""Worker for the multi-process (multi-host-style) distributed test.

Usage: multiprocess_worker.py <coordinator> <num_procs> <proc_id>

Each process gets 4 virtual CPU devices (8 global across 2 processes),
initializes ``jax.distributed`` with gloo CPU collectives, builds a
global ``data``-sharded mesh, and runs batch-sharded sine inference whose
result must match the single-process golden on every shard.  This is the
SURVEY.md §4 "multi-host tests on a multi-process backend" tier.
"""

import sys

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=4").strip()
# repo root on the import path (the launcher strips PYTHONPATH so the
# axon sitecustomize does not hijack the platform)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

coordinator, num_procs, proc_id = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

import jax

jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(coordinator, num_processes=num_procs, process_id=proc_id)

import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from microflow_tpu import compile_tflite

assert len(jax.devices()) == 4 * num_procs, jax.devices()

model = compile_tflite("models/sine.tflite", name="sine")
mesh = Mesh(np.asarray(jax.devices()).reshape(-1, 1), axis_names=("data", "model"))
batch_sharding = NamedSharding(mesh, P("data", None))
repl = NamedSharding(mesh, P())

B = 4 * len(jax.devices())
# every process constructs the same global input from its local shard
xs_global = np.linspace(0.0, 2 * np.pi, B, dtype=np.float32).reshape(B, 1)
xq_global = np.asarray(model.quantize_input(xs_global))
n_local = B // num_procs
local = xq_global[proc_id * n_local : (proc_id + 1) * n_local]
xq = jax.make_array_from_process_local_data(batch_sharding, local, (B, 1))

params = jax.device_put(model.params, repl)
fn = jax.jit(
    model._predict_from_quantized,
    in_shardings=(repl, batch_sharding),
    out_shardings=batch_sharding,
)
out = fn(params, xq)
# gather local shards and compare to the single-process result
local_out = np.concatenate(
    [np.asarray(s.data) for s in out.addressable_shards]
)
want = np.asarray(model.predict(xs_global[proc_id * n_local : (proc_id + 1) * n_local]))
assert np.array_equal(local_out, want), (local_out, want)

# a cross-process collective: global mean of the outputs via psum
total = jax.jit(
    lambda o: jax.numpy.sum(o),
    in_shardings=(batch_sharding,),
    out_shardings=repl,
)(out)
expected_total = float(np.asarray(model.predict(xs_global)).sum())
assert abs(float(total) - expected_total) < 1e-4, (float(total), expected_total)

print(f"proc {proc_id}: OK ({len(jax.devices())} global devices)")
