"""Static cost model: MACs / bytes per inference from the graph IR.

Used by the benchmark harness for roofline reporting (reference analog:
the offline Jupyter performance notebooks, ``analysis/performance/``).
"""

from __future__ import annotations

import numpy as np

from ..compiler.ir import (
    AveragePool2DLayer,
    Conv2DLayer,
    DepthwiseConv2DLayer,
    FullyConnectedLayer,
    Graph,
    ReshapeLayer,
    SoftmaxLayer,
)


def macs_per_inference(graph: Graph) -> int:
    total = 0
    for layer in graph.layers:
        if isinstance(layer, FullyConnectedLayer):
            k, n = layer.weights.shape
            total += k * n
        elif isinstance(layer, Conv2DLayer):
            f, kh, kw, c = layer.filters.shape
            total += layer.geom.out_rows * layer.geom.out_cols * kh * kw * c * f
        elif isinstance(layer, DepthwiseConv2DLayer):
            kh, kw, ch = layer.weights.shape
            total += layer.geom.out_rows * layer.geom.out_cols * kh * kw * ch
        elif isinstance(layer, AveragePool2DLayer):
            g = layer.geom
            total += g.out_rows * g.out_cols * g.k_rows * g.k_cols  # adds, counted as MACs
    return int(total)


def activation_bytes_per_inference(graph: Graph) -> int:
    """int8 activation traffic (each layer output written once, read once)."""
    total = int(np.prod(graph.input_shape))
    for layer in graph.layers:
        total += int(np.prod(layer.out_shape))
    return 2 * total


def weight_bytes(graph: Graph) -> int:
    total = 0
    for layer in graph.layers:
        if isinstance(layer, (FullyConnectedLayer,)):
            total += layer.weights.size
        elif isinstance(layer, Conv2DLayer):
            total += layer.filters.size
        elif isinstance(layer, DepthwiseConv2DLayer):
            total += layer.weights.size
    return total
