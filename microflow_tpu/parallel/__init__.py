"""Parallel execution layer: device mesh, shardings, batch-serving executor."""

from .executor import BatchServer
from .mesh import (
    batch_sharding,
    make_mesh,
    replicate_params,
    shard_batch,
    shard_params,
    tp_spec,
)

__all__ = [
    "BatchServer",
    "batch_sharding",
    "make_mesh",
    "replicate_params",
    "shard_batch",
    "shard_params",
    "tp_spec",
]
