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
