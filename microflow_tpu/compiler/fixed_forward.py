"""Fixed-point-requant forward pass.

Builds a forward that runs every MAC op (FC / Conv2D / DWConv) with the
(multiplier, right-shift) integer requant from ``core/fixedpoint.py``
instead of the reference's f32 recipe.  Non-MAC ops (avgpool's mean
rescale, softmax, QUANTIZE) keep the exact float path -- they are not
accumulator requants.

This is the derivation SURVEY.md §7(d) asks for; ``tests/test_fixedpoint.py``
proves the <=1 LSB bound against the default forward on all models.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.fixedpoint import derive_bias_q, quantize_multipliers, requant_fixed
from ..core.tensor import reshape_2d
from ..ops.conv_2d import conv_2d_accumulate
from ..ops.depthwise_conv_2d import depthwise_conv_2d_accumulate
from .builder import _broadcast_per_channel, apply_layer
from .ir import Conv2DLayer, DepthwiseConv2DLayer, FullyConnectedLayer


def _fc_fixed(layer, p, x):
    if layer.flatten_input:
        x = reshape_2d(x)
    acc = jnp.dot(x, p["weights"], preferred_element_type=jnp.int32)
    if layer.w_q.zp0 != 0:
        acc = acc - jnp.sum(x.astype(jnp.int32), axis=1, keepdims=True) * jnp.int32(layer.w_q.zp0)
    q = acc - p["c2"][None, :] + jnp.int32(layer.c3)
    m, s = quantize_multipliers(layer.c1)
    bias_q = derive_bias_q(p["c0"], layer.c1)
    return requant_fixed(
        q, bias_q[None, :], jnp.asarray(m), jnp.asarray(s),
        layer.out_q.zp0, layer.activation, float(layer.out_q.scale0),
    )


def _conv_fixed(layer, p, x):
    F = layer.filters.shape[0]
    w_zp = _broadcast_per_channel(layer.w_q.zero_point, F, np.int32)
    c1 = _broadcast_per_channel(layer.c1, F, np.float32)
    q = conv_2d_accumulate(x, p["weights"], layer.geom, layer.in_q.zp0, w_zp)
    m, s = quantize_multipliers(c1)
    bias_q = derive_bias_q(p["c0"], c1)
    return requant_fixed(
        q, bias_q[None, None, None, :], jnp.asarray(m), jnp.asarray(s),
        layer.out_q.zp0, layer.activation, float(layer.out_q.scale0),
    )


def _dwconv_fixed(layer, p, x):
    CH = layer.weights.shape[2]
    w_zp = _broadcast_per_channel(layer.w_q.zero_point, CH, np.int32)
    c1 = _broadcast_per_channel(layer.c1, CH, np.float32)
    in_c = x.shape[-1]
    if in_c != CH:
        idx = np.array([c if c < in_c else 0 for c in range(CH)])
        x = x[..., idx]
    q = depthwise_conv_2d_accumulate(x, p["weights"], layer.geom, layer.in_q.zp0, w_zp)
    m, s = quantize_multipliers(c1)
    bias_q = derive_bias_q(p["c0"], c1)
    return requant_fixed(
        q, bias_q[None, None, None, :], jnp.asarray(m), jnp.asarray(s),
        layer.out_q.zp0, layer.activation, float(layer.out_q.scale0),
    )


def build_fixed_forward(graph):
    """forward(params, xq) -> yq with fixed-point MAC requants."""
    # requant_fixed saturates to the int8 range; a uint8 graph would
    # silently produce wrong-range outputs, so refuse it up front.
    if np.dtype(graph.input_dtype) != np.int8:
        raise NotImplementedError(
            f"fixed-point forward supports int8 graphs only, got {graph.input_dtype}"
        )

    def forward(params, xq):
        x = xq
        for layer in graph.layers:
            key = f"layer{layer.index}"
            if isinstance(layer, FullyConnectedLayer):
                x = _fc_fixed(layer, params[key], x)
            elif isinstance(layer, Conv2DLayer):
                x = _conv_fixed(layer, params[key], x)
            elif isinstance(layer, DepthwiseConv2DLayer):
                x = _dwconv_fixed(layer, params[key], x)
            else:
                x = apply_layer(layer, params, x, "xla")
        return x

    return forward
