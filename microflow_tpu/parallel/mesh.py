"""Device mesh + sharding helpers (new capability layer -- the reference
has zero parallelism, SURVEY.md 2.5).

Design (per the scaling-book recipe): pick a mesh, annotate shardings,
let XLA insert collectives.

* ``data`` axis: batch sharding (DP).  Inference is embarrassingly
  parallel over the batch; a batch-sharded input + replicated weights
  needs NO collectives in the forward pass -- XLA compiles to fully
  local compute per chip.
* ``model`` axis: optional tensor sharding of the widest FC/conv weights
  (demo-scale here: MicroFlow-class models are <= 0.3 MB, so replication
  is the right default; TP exists to prove the shardings compose).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def mesh_devices(min_devices: int = 1):
    """Devices to build meshes from: the default backend, unless it has
    fewer than ``min_devices``, in which case fall back to the (virtual,
    ``--xla_force_host_platform_device_count``) CPU backend so sharding
    logic stays testable on a single-chip or no-TPU host."""
    devices = jax.devices()
    if len(devices) < min_devices:
        try:
            cpu = jax.devices("cpu")
        except RuntimeError:
            cpu = []
        if len(cpu) > len(devices):
            devices = cpu
    return devices


def make_mesh(n_data: int | None = None, n_model: int = 1, devices=None) -> Mesh:
    if devices is None:
        devices = mesh_devices(min_devices=(n_data or 1) * n_model)
    if n_data is None:
        n_data = len(devices) // n_model
    dev = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard dim 0 (batch) across the ``data`` axis, replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, x) -> jax.Array:
    return jax.device_put(x, batch_sharding(mesh, np.ndim(x)))


def replicate_params(mesh: Mesh, params) -> dict:
    return jax.device_put(params, replicated(mesh))


def tp_spec(name: str, arr, n_model: int, min_rows: int) -> P:
    """Default tensor-parallel policy: shard 2D FC weight matrices (and
    their i32 gradient accumulators, which must follow the same layout)
    along the contraction dim (axis 0 -- weights are stored (in, out))
    over the ``model`` axis.  GSPMD then inserts the psum over partial
    int32 products; integer addition is associative, so TP execution is
    bit-identical to replicated execution (asserted in
    ``tests/test_parallel.py``)."""
    if (
        name in ("weights", "weights_gradient")
        and getattr(arr, "ndim", 0) == 2
        and arr.shape[0] % n_model == 0
        and arr.shape[0] >= min_rows
    ):
        return P("model", None)
    return P()


def shard_params(mesh: Mesh, tree: dict, policy="tp", min_rows: int | None = None) -> dict:
    """Place a params/grads tree on ``mesh`` under a sharding policy.

    Replaces the ad-hoc per-layer device_put logic (round-1
    ``__graft_entry__``); this is the library TP surface (SURVEY.md 2.5).

    ``policy``:
      * ``"replicate"`` -- everything replicated (DP-only).
      * ``"tp"`` -- :func:`tp_spec` on every leaf: big 2D FC weights and
        their gradient accumulators row-sharded over the ``model`` axis,
        everything else replicated.  Falls back to full replication when
        the mesh has no ``model`` axis (or it has size 1).
      * callable ``(layer_key, name, arr) -> PartitionSpec | None`` --
        custom; ``None`` means replicate.
    """
    n_model = dict(zip(mesh.axis_names, mesh.devices.shape)).get("model", 1)
    if min_rows is None:
        min_rows = 2 * n_model

    def spec_for(key, name, arr):
        if callable(policy):
            s = policy(key, name, arr)
            return s if s is not None else P()
        if policy == "replicate" or n_model <= 1:
            return P()
        if policy == "tp":
            return tp_spec(name, arr, n_model, min_rows)
        raise ValueError(f"unknown sharding policy: {policy!r}")

    return {
        key: {
            name: jax.device_put(arr, NamedSharding(mesh, spec_for(key, name, arr)))
            for name, arr in sub.items()
        }
        for key, sub in tree.items()
    }
