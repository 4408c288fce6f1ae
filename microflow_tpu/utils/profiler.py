"""Tracing / profiling aids (reference analog: criterion benches + the
macro-expansion dump ``target/microflow-expansion.rs``; SURVEY.md 5).
"""

from __future__ import annotations

import os
import time

import numpy as np

from ..compiler.ir import Graph
from .flops import macs_per_inference


def layer_table(graph: Graph) -> str:
    """Static per-layer cost table (MACs, output activation bytes)."""
    rows = ["idx  type                  out_shape           MACs"]
    from ..compiler.ir import (
        AveragePool2DLayer,
        Conv2DLayer,
        DepthwiseConv2DLayer,
        FullyConnectedLayer,
    )

    for layer in graph.layers:
        if isinstance(layer, FullyConnectedLayer):
            macs = int(np.prod(layer.weights.shape))
        elif isinstance(layer, Conv2DLayer):
            f, kh, kw, c = layer.filters.shape
            macs = layer.geom.out_rows * layer.geom.out_cols * kh * kw * c * f
        elif isinstance(layer, DepthwiseConv2DLayer):
            kh, kw, ch = layer.weights.shape
            macs = layer.geom.out_rows * layer.geom.out_cols * kh * kw * ch
        elif isinstance(layer, AveragePool2DLayer):
            g = layer.geom
            macs = g.out_rows * g.out_cols * g.k_rows * g.k_cols
        else:
            macs = 0
        rows.append(
            f"{layer.index:<4d} {type(layer).__name__:<20s}  {str(layer.out_shape):<18s}  {macs:,}"
        )
    rows.append(f"total {macs_per_inference(graph):,} MACs/inference")
    return "\n".join(rows)


def dump_expansion(model, path: str = "target/microflow-expansion.txt", batch_size: int = 1):
    """Write the traced program to disk (reference dumps its macro
    expansion to ``target/microflow-expansion.rs``,
    ``microflow-macros/src/lib.rs:180``)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write(layer_table(model.graph))
        f.write("\n\n")
        f.write(model.expansion(batch_size))
    return path


def time_predict(model, batch_size: int = 512, iters: int = 30) -> dict:
    """Measured throughput with a serialized chain + host readback
    barrier (see bench.py for why block_until_ready is not enough under
    remote-execution relays)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chain(params, xq):
        yq = model._forward(params, xq)
        bump = yq.reshape(yq.shape[0], -1)[:, :1]
        bump = bump.reshape(bump.shape + (1,) * (xq.ndim - bump.ndim))
        return (xq + bump).astype(xq.dtype), yq

    xq = jax.random.randint(
        jax.random.PRNGKey(0), (batch_size, *model.graph.input_shape), -128, 128, dtype=jnp.int8
    )
    x, y = chain(model.params, xq)
    _ = int(y.reshape(-1)[0])
    t0 = time.time()
    for _ in range(iters):
        x, y = chain(model.params, x)
    _ = int(y.reshape(-1)[0])
    dt = (time.time() - t0) / iters
    macs = macs_per_inference(model.graph)
    return {
        "batch": batch_size,
        "ms_per_batch": dt * 1e3,
        "inferences_per_s": batch_size / dt,
        "tmacs_per_s": macs * batch_size / dt / 1e12,
    }
