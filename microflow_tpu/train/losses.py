"""Losses and initial backward gradients (reference R16 part,
``src/update_layer.rs:296-345``).

Gradients are integer (i32) differences of quantized buffers -- the
reference backpropagates raw quantized-domain deltas, not float grads.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.numerics import f32
from ..ops.softmax import softmax


def mse_loss(pred_q: jax.Array, gt_q: jax.Array, scale: float) -> jax.Array:
    """``0.5 * sum((scale * (pred - gt))^2)`` (``update_layer.rs:296-306``)."""
    diff = jnp.float32(scale) * (f32(pred_q) - f32(gt_q))
    return 0.5 * jnp.sum(diff * diff)


def mse_grad(pred_q: jax.Array, gt_q: jax.Array) -> jax.Array:
    """i32 ``pred - gt`` (``update_layer.rs:308-315``)."""
    return pred_q.astype(jnp.int32) - gt_q.astype(jnp.int32)


def crossentropy_grad(
    logits_q: jax.Array, out_scale: float, out_zp: int, label_q: jax.Array, in_scale: float
) -> jax.Array:
    """``softmax(pred) - label`` in the quantized domain, i32
    (``update_layer.rs:316-333``).  ``in_scale`` is the logits' scale
    (softmax dequantizes with it)."""
    sm = softmax(logits_q, in_scale=in_scale, out_scale=out_scale, out_zp=out_zp)
    return sm.astype(jnp.int32) - label_q.astype(jnp.int32)


def cross_entropy_loss(
    logits_q: jax.Array, out_scale: float, out_zp: int, label_q: jax.Array, in_scale: float
) -> jax.Array:
    """``sum(label * log(softmax(pred)))`` on dequantized values
    (``update_layer.rs:334-345``)."""
    sm = softmax(logits_q, in_scale=in_scale, out_scale=out_scale, out_zp=out_zp)
    sm_f = jnp.float32(out_scale) * (f32(sm) - jnp.float32(out_zp))
    label_f = jnp.float32(out_scale) * (f32(label_q) - jnp.float32(out_zp))
    return jnp.sum(label_f * jnp.log(sm_f))
