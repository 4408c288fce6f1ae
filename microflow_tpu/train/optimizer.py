"""Integer SGD update family (reference R16, ``src/update_layer.rs``).

Numeric fidelity notes (all replicated exactly):

* ``update_weights_2D``/``_4D`` round the step (`.round()` = half away
  from zero) before the saturating f32->int cast;
* ``update_weights_clip_norm_2D`` (the variant the train codegen actually
  emits) does NOT round -- Rust's ``as`` float->int TRUNCATES toward zero;
  its norm uses *integer* division ``g / batch`` per element, squares in
  wrapping i32, accumulates in f32;
* weight subtraction is saturating in the weight dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..core.numerics import f32, round_away, saturating_add_i32, saturating_sub_int


def _sat_cast_trunc(x: jax.Array, dtype) -> jax.Array:
    """Rust ``as`` from f32 to int: truncate toward zero, saturate, NaN->0."""
    info = jnp.iinfo(dtype)
    t = jnp.trunc(x)
    t = jnp.where(jnp.isnan(t), 0.0, jnp.clip(t, info.min, info.max))
    return t.astype(dtype)


def _sat_cast_round(x: jax.Array, dtype) -> jax.Array:
    """`.round()` then ``as``: half-away round, saturate, NaN->0."""
    return _sat_cast_trunc(round_away(x), dtype)


def update_weights_2d(weights, grad_i32, batch_size: int, lr: float):
    """Plain SGD (``update_layer.rs:13-27``)."""
    delta = _sat_cast_round(jnp.float32(lr) * f32(grad_i32) / jnp.float32(batch_size), weights.dtype)
    return saturating_sub_int(weights, delta)


def update_weights_max_2d(weights, grad_i32, batch_size: int, lr: float):
    """Max-rescaled SGD (``update_layer.rs:69-94``)."""
    mx = jnp.max(jnp.abs(grad_i32))
    scale = jnp.float32(127.0) * jnp.float32(batch_size) / f32(mx)
    delta = _sat_cast_trunc(
        jnp.float32(lr) * f32(grad_i32) * scale / jnp.float32(batch_size), weights.dtype
    )
    return saturating_sub_int(weights, delta)


def update_weights_clip_2d(weights, grad_i32, batch_size: int, lr: float):
    """Clip-at-127x-min SGD (``update_layer.rs:95-129``)."""
    a = jnp.abs(grad_i32)
    min_val = jnp.min(jnp.where(a > 0, a, jnp.int32(2**31 - 1)))
    scale = jnp.float32(batch_size) / f32(min_val)
    clip_value = f32(min_val) * jnp.float32(127.0)
    g = f32(grad_i32)
    clipped = jnp.where(jnp.abs(g) < clip_value, g, clip_value * jnp.sign(g))
    delta = _sat_cast_trunc(jnp.float32(lr) * clipped * scale / jnp.float32(batch_size), weights.dtype)
    return saturating_sub_int(weights, delta)


def update_weights_clip_norm_2d(weights, grad_i32, batch_size: int, lr: float):
    """Norm-clipped SGD -- THE variant the FC train codegen emits
    (``update_layer.rs:130-157``;
    ``microflow-train-macros/src/ops/fully_connected.rs:340``)."""
    # Rust i32 division truncates toward zero (jnp // floors):
    per = jnp.sign(grad_i32) * (jnp.abs(grad_i32) // jnp.int32(batch_size))
    sq = per * per  # wrapping i32, as in the reference
    norm = jnp.sqrt(jnp.sum(f32(sq)))
    scale = jnp.where(norm > 127.0, jnp.float32(1024.0) / norm, jnp.float32(1.0))
    delta = _sat_cast_trunc(
        jnp.float32(lr) * f32(grad_i32) * scale / jnp.float32(batch_size), weights.dtype
    )
    return saturating_sub_int(weights, delta)


def update_weights_perc_2d(weights, grad_i32, batch_size: int, lr: float, perc: int):
    """Top-``perc``-|g| update (``update_layer.rs:28-68``)."""
    flat = jnp.abs(grad_i32).reshape(-1)
    vals, idx = lax.top_k(flat, perc)
    mx = vals[0]
    scale = jnp.float32(127.0) * jnp.float32(batch_size) / f32(mx)
    g = f32(grad_i32.reshape(-1)[idx])
    delta = _sat_cast_trunc(jnp.float32(lr) * g * scale / jnp.float32(batch_size), weights.dtype)
    w = weights.reshape(-1)
    w = w.at[idx].set(saturating_sub_int(w[idx], delta))
    return w.reshape(weights.shape)


def update_weights_2d_float(weights_f32, grad_f32, batch_size: int, lr: float):
    """f32 update for the folded bias constants C0
    (``update_layer.rs:158-169``)."""
    return weights_f32 - jnp.float32(lr) * grad_f32 / jnp.float32(batch_size)


def update_weights_2d_from_float(weights, grad_f32, w_scale: float, batch_size: int, lr: float):
    """Plain SGD driven by a dequantized-domain f32 gradient (the e2e
    completion of the reference's "unquantized" twin experiment — the
    reference computes these gradients, ``gradient_fully_connected.rs:118-152``,
    but its update call sites are commented out, ``:42-50``, so the step
    form is undefined there).  The f32 gradient is converted onto the
    int8 weight grid (divide by the weight scale) and then applied with
    ``update_weights_2D``'s exact rounding/saturation form."""
    step = jnp.float32(lr) * grad_f32 / (jnp.float32(batch_size) * jnp.float32(w_scale))
    delta = _sat_cast_round(step, weights.dtype)
    return saturating_sub_int(weights, delta)


# update_weights_4D shares update_weights_2D's elementwise math
# (shape-agnostic in JAX)
update_weights_4d = update_weights_2d


def update_weights_perc_4d(weights, grad_i32, batch_size: int, lr: float, perc: int):
    """Top-``perc``-|g| update, 4D semantics (``update_layer.rs:215-260``).

    NOT the 2D math: the reference's 4D variant applies *plain rounded
    SGD* (``round(lr*g/batch)``, no 127/max rescale) restricted to the
    top-``perc`` elements by |gradient|.  Tie order matches the
    reference's insertion sort (earlier-scanned element wins ties),
    which is ``lax.top_k``'s lowest-flat-index-first order.

    Degenerate corner (fewer than ``perc`` elements with nonzero |g|):
    the reference's fixed-size insertion list keeps its default
    ``(0, (0,0,0,0))`` entries, and the final loop re-applies the
    saturating update at flat index 0 once per leftover slot, reading
    the REAL gradient there (``update_layer.rs:253-259``).  Replicated
    below: same-sign saturating subtraction is monotone, so k extra
    applications equal one wide-integer subtract of ``k * delta0``.
    """
    flat = jnp.abs(grad_i32).reshape(-1)
    _, idx = lax.top_k(flat, perc)
    g = f32(grad_i32.reshape(-1)[idx])
    delta = _sat_cast_round(jnp.float32(lr) * g / jnp.float32(batch_size), weights.dtype)
    w = weights.reshape(-1)
    w = w.at[idx].set(saturating_sub_int(w[idx], delta))
    # leftover default slots -> extra updates at flat index 0
    nnz = jnp.sum((flat > 0).astype(jnp.int32))
    extra = jnp.maximum(jnp.int32(perc) - nnz, 0)
    delta0 = _sat_cast_round(
        jnp.float32(lr) * f32(grad_i32.reshape(-1)[0]) / jnp.float32(batch_size),
        weights.dtype,
    )
    info = jnp.iinfo(weights.dtype)
    w0 = jnp.clip(
        w[0].astype(jnp.int32) - extra * delta0.astype(jnp.int32),
        info.min,
        info.max,
    ).astype(weights.dtype)
    w = w.at[0].set(w0)
    return w.reshape(weights.shape)


def update_constants_fully_connected(weights, in_zp: int) -> jax.Array:
    """Re-fold C2 = in_zp * colsum(W) after a weight update
    (``update_layer.rs:199-214``)."""
    return (jnp.sum(weights.astype(jnp.int32), axis=0) * jnp.int32(in_zp)).astype(jnp.int32)


def accumulate_gradient_2d(current, accum_i32):
    """Plain wrapping i32 accumulation (``update_layer.rs:261-271``)."""
    return accum_i32 + current.astype(jnp.int32)


def accumulate_gradient_4d(current, accum_i32):
    """Saturating i32 accumulation (``update_layer.rs:273-294``)."""
    return saturating_add_i32(accum_i32, current.astype(jnp.int32))


def accumulate_gradient_4d_fold(dW_b, accum_i32):
    """Batch-order saturating fold of per-sample gradients: the literal
    repetition of the reference's per-sample ``accumulate_gradient_4D``
    calls (``update_layer.rs:273-294``, driven one sample at a time by
    ``examples/speech_train.rs:76-93``) over the sample axis.

    Round-5 fast path: per-sample conv/dw gradients are int8
    (``_sat_cast_nan0(..., jnp.int8)``), so every entry is in
    [-127, 127] and any prefix of the fold stays inside
    [min(acc) - 127B, max(acc) + 127B].  When that interval is within
    i32 (checked with pure i32 comparisons against python-constant
    thresholds -- no cumsum, no [B, *W] traffic), no clamp can fire at
    ANY step, and the saturating fold equals ``acc + sum(dW)`` exactly;
    ``lax.cond`` falls back to the literal serial fold otherwise.
    Bit-exact in both branches.  Measured (scripts/ab_backward.py,
    person_detect 10 layers @B=1024): the serial fold was 2.35 ms of
    the 7.87 ms step; the plain-sum path removes it.

    The serial ``fori_loop`` fallback is the reference semantics of
    record: in-jit chained measurement (scripts/profile_train.py)
    reads it 1.8-2.0x faster than the vectorized cumsum form
    (``accumulate_gradient_4d_batch``) -- the fold is B tiny
    latency-bound adds, while the cumsum materializes a [B, *W] i32
    prefix tensor plus overflow masks through HBM
    (docs/PERFORMANCE.md round 4)."""
    acc = accum_i32.astype(jnp.int32)

    def slow(_):
        return lax.fori_loop(
            0, dW_b.shape[0],
            lambda i, a: saturating_add_i32(a, dW_b[i].astype(jnp.int32)),
            acc,
        )

    if dW_b.dtype != jnp.int8:
        return slow(None)
    margin = 127 * dW_b.shape[0]
    if margin >= 2**31:
        return slow(None)
    ok = (jnp.max(acc) <= np.int32(2**31 - 1 - margin)) & (
        jnp.min(acc) >= np.int32(-(2**31) + margin))

    def fast(_):
        return acc + jnp.sum(dW_b.astype(jnp.int32), axis=0)

    return lax.cond(ok, fast, slow, None)


def accumulate_gradient_4d_fold_many(pairs):
    """One-cond form of :func:`accumulate_gradient_4d_fold` over several
    layers' (dW_b, acc) pairs: the per-layer ``lax.cond`` is a fusion
    barrier XLA pays ~10x per train step (measured ~1.2 ms @B=1024,
    scripts/ab_backward.py noaccum delta), so the trainer defers every
    conv/dw accumulation and runs ONE cond whose predicate is the AND
    of all the per-layer no-clamp bounds.  Semantics are unchanged:
    the fast branch is each layer's plain sum (bit-equal when no
    prefix can clamp), the fallback is each layer's literal serial
    fold.  Returns the new accumulators in order."""
    if not pairs:
        return []
    checks = []
    for dW_b, acc in pairs:
        if dW_b.dtype != jnp.int8 or 127 * dW_b.shape[0] >= 2**31:
            # a non-int8 layer poisons the fast branch: fold it alone
            return ([accumulate_gradient_4d_fold(pairs[0][0], pairs[0][1])]
                    + accumulate_gradient_4d_fold_many(pairs[1:]))
        margin = 127 * dW_b.shape[0]
        checks.append((jnp.max(acc) <= np.int32(2**31 - 1 - margin))
                      & (jnp.min(acc) >= np.int32(-(2**31) + margin)))
    ok = checks[0]
    for c in checks[1:]:
        ok = ok & c

    def fast(ops):
        return tuple(acc + jnp.sum(d.astype(jnp.int32), axis=0)
                     for d, acc in ops)

    def slow(ops):
        return tuple(
            lax.fori_loop(
                0, d.shape[0],
                lambda i, a, d=d: saturating_add_i32(a, d[i].astype(jnp.int32)),
                acc)
            for d, acc in ops)

    ops = tuple((d, acc.astype(jnp.int32)) for d, acc in pairs)
    return list(lax.cond(ok, fast, slow, ops))


def accumulate_gradient_4d_batch(dW_b, accum_i32):
    """Batch-order saturating accumulation of per-sample gradients:
    the vectorized-exact form of folding ``accumulate_gradient_4d``
    over the sample axis in batch order (the reference's per-sample
    ``accumulate_gradient_4D`` calls, ``update_layer.rs:273-294``,
    driven one sample at a time by ``examples/speech_train.rs:76-93``).

    Saturating addition is order-dependent ONLY when a clamp fires.
    Every prefix of the fold is checked with wrapping i32 arithmetic
    (associative, so the prefix sums vectorize as one cumsum): step j
    overflows iff ``sign(s_{j-1}) == sign(d_j)`` and
    ``sign(s_j) != sign(d_j)``, where ``s_{j-1} = s_j - d_j`` wraps
    back exactly.  If no step overflows, no clamp ever fired and the
    saturating fold equals the last wrapping prefix sum; otherwise
    ``lax.cond`` falls back to the reference's serial fold.  Bit-exact
    in both branches.

    NOT the production path: in-jit chained measurement on TPU reads it
    0.49-0.55x the serial fold's speed (the cumsum + overflow masks are
    [B, *W] i32 HBM traffic; the fold is latency-bound tiny adds) --
    kept as the measured-rejected design of record with its unit tests
    (docs/PERFORMANCE.md round 4, scripts/profile_train.py).
    """
    d = dW_b.astype(jnp.int32)
    acc = accum_i32.astype(jnp.int32)
    cs = acc[None] + jnp.cumsum(d, axis=0)  # wrapping prefix sums
    prev = cs - d  # wrapping inverse: s_{j-1}
    step_overflow = ((prev >= 0) == (d >= 0)) & ((cs >= 0) != (d >= 0))
    ok = ~jnp.any(step_overflow)

    def fast(_):
        return cs[-1]

    def slow(_):
        return lax.fori_loop(
            0, d.shape[0], lambda i, a: saturating_add_i32(a, d[i]), acc
        )

    return lax.cond(ok, fast, slow, None)
