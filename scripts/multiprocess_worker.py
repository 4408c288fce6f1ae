#!/usr/bin/env python
"""Worker for the multi-process (multi-host-style) distributed test.

Usage: multiprocess_worker.py <coordinator> <num_procs> <proc_id> [mode]

Each process gets 4 virtual CPU devices (8 global across 2 processes),
initializes ``jax.distributed`` with gloo CPU collectives, and runs one
of two checks (the SURVEY.md §4 "multi-host tests on a multi-process
backend" tier):

* ``infer`` (default) -- batch-sharded sine inference over a global
  ``data`` mesh, bit-checked against single-process on every shard.
* ``train_tp`` -- a speech TP TRAIN step + optimizer update with the FC
  weight matrix row-sharded over a ``model`` axis that SPANS the two
  processes (mesh column i = (proc0_dev_i, proc1_dev_i)), so GSPMD's
  psum over partial int32 products crosses the process boundary.
  Updated params and gradient accumulators must be bit-equal to the
  single-process replicated step on every addressable shard
  (round-4 VERDICT task 7).
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
mode = sys.argv[4] if len(sys.argv) > 4 else "infer"

import jax

jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(coordinator, num_processes=num_procs, process_id=proc_id)

import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from microflow_tpu import compile_tflite

assert len(jax.devices()) == 4 * num_procs, jax.devices()


def _shards_equal(arr, want):
    """Every addressable shard of a global array matches the reference
    slice -- the only comparison a process can make about a sharded
    global array it does not fully own."""
    for s in arr.addressable_shards:
        if not np.array_equal(np.asarray(s.data), np.asarray(want)[s.index]):
            return False
    return True


if mode == "train_tp":
    from microflow_tpu.parallel import shard_params
    from microflow_tpu.parallel.mesh import batch_sharding
    from microflow_tpu.train import compile_tflite_train

    m = compile_tflite_train("models/speech.tflite", 2, "crossentropy", True,
                             name="speech")
    # model axis SPANS the processes: column i = (proc0_dev_i, proc1_dev_i),
    # so the TP psum over the row-sharded FC contraction crosses the
    # process boundary (the point of this tier)
    dev = np.asarray(jax.devices())
    assert num_procs == 2
    mesh = Mesh(np.stack([dev[:4], dev[4:]], axis=1), axis_names=("data", "model"))

    B = 8
    rng = np.random.default_rng(0)
    xq = rng.integers(-128, 128, size=(B, 1960)).astype(np.int8)
    gt = np.full((B, 4), -128, np.int8)
    gt[:, 1] = 127

    params_tp = shard_params(mesh, m.params, policy="tp")
    grads_tp = shard_params(mesh, m.grads, policy="tp")
    assert not params_tp["layer2"]["weights"].sharding.is_fully_replicated
    xq_s = jax.device_put(xq, batch_sharding(mesh, 2))
    gt_s = jax.device_put(gt, batch_sharding(mesh, 2))
    with mesh:
        final_tp, _loss, grads_tp = jax.jit(m._train_step)(
            params_tp, grads_tp, xq_s, gt_s)
        params_tp, grads_tp = jax.jit(
            m._update_step, static_argnames=("batch_size", "lr"))(
            params_tp, grads_tp, batch_size=B, lr=0.5)
        jax.block_until_ready((final_tp, params_tp))

    # single-process replicated reference, computed locally by each proc
    # (identical host-constructed inputs)
    final_r, _loss_r, grads_r = m._train_step(m.params, m.grads, xq, gt)
    params_r, grads_r = m._update_step(m.params, grads_r, batch_size=B, lr=0.5)

    assert _shards_equal(final_tp, np.asarray(final_r)), "final mismatch"
    for key in params_r:
        for name in params_r[key]:
            assert _shards_equal(params_tp[key][name],
                                 np.asarray(params_r[key][name])), (key, name)
    for key in grads_r:
        for name in grads_r[key]:
            assert _shards_equal(grads_tp[key][name],
                                 np.asarray(grads_r[key][name])), (key, name)
    print(f"proc {proc_id}: OK ({len(jax.devices())} global devices, tp train)")
    sys.exit(0)

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
