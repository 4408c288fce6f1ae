"""Quantized FullyConnected (reference R6, ``src/ops/fully_connected.rs``).

The reference computes, per output element (i, j):

    acc    = sum_k in[i,k] * w[k,j]                        (i32)
    x1[i]  = sum_k in[i,k] * w_zp                          (i32)
    q      = acc - x1 - C2[j] + C3                         (i32, exact)
    y      = roundf(out_zp + C0[j] + C1 * f32(q))          (f32)
    out    = saturating_cast(y) |> fused activation        (int)

with C2[j] = colsum(W)[j] * in_zp and C3 = K * in_zp * w_zp folded at
compile time (``microflow-macros/src/ops/fully_connected.rs:96-119``).
Integer arithmetic is exact, so q == sum_k (in-in_zp)(w-w_zp); we keep the
reference's 4-term decomposition so the matmul runs on raw int8 operands
(MXU int8 path) without materializing centered i32 inputs.

Batched: the reference hardcodes INPUT_ROWS=1; here the leading dim is a
free batch dimension.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.activation import FusedActivation, apply_fused_activation
from ..core.numerics import f32, round_away, saturating_cast


def fully_connected(
    x: jax.Array,  # [B, K] quantized ints
    weights: jax.Array,  # [K, N] quantized ints
    *,
    w_zp: int,
    bias0: np.ndarray,  # f32 [N] = f32(out_zp) + C0   (folded)
    c1: float,  # f32 scalar
    c2: np.ndarray,  # i32 [N]
    c3: int,  # i32 scalar
    out_scale: float,
    out_zp: int,
    activation: FusedActivation,
) -> jax.Array:
    out_dtype = x.dtype
    x32 = x.astype(jnp.int32)
    acc = jax.lax.dot(
        x, weights, preferred_element_type=jnp.int32
    )  # [B, N] i32 (int8 x int8 -> MXU int8 path on TPU)
    rowsum = jnp.sum(x32, axis=1, keepdims=True) * jnp.int32(w_zp)  # [B, 1]
    q = acc - rowsum - jnp.asarray(c2, jnp.int32)[None, :] + jnp.int32(c3)
    y = round_away(jnp.asarray(bias0, jnp.float32)[None, :] + jnp.float32(c1) * f32(q))
    y = saturating_cast(y, out_dtype)
    return apply_fused_activation(y, activation, out_scale, out_zp)
