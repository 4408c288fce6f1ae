"""Fixed-point requantization: (integer multiplier, right-shift) form.

SURVEY.md §7 hard part (d): the engine's default requant is the
reference's exact recipe ``roundf(bias0 + C1 * f32(q))``.  Production
integer runtimes (TFLite/TFLM, and the intended Pallas end-state) instead
fold ``C1`` into an integer multiplier + rounding right-shift:

    y = out_zp + rshift_round((q + bias_q) * M, S)
    C1 ~= M / 2**S,    bias_q = round(C0 / C1)   (the bias in acc scale)

This module derives that form.  JAX runs with x64 disabled here (no
int64/float64 lanes), so the integer product ``(q + bias_q) * M`` is
carried in float32: with 15-bit multipliers the carried value can reach
~2**43, beyond f32's 24-bit mantissa, so individual products round -- but
the relative error (2**-24 of a value whose final magnitude is the int8
output range) is orders of magnitude below half an output quantum away
from ties.  ``tests/test_fixedpoint.py`` proves the <=1 output LSB bound
vs the exact-f32 recipe on every bundled model -- the same bound the
reference's accuracy analysis shows vs TFLite (whose 31-bit multipliers
in i64 don't survive the int8 output quantum either).  Under
``jax_enable_x64`` the same code evaluates the integer form exactly.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from .activation import FusedActivation, quantize_scalar

_MBITS = 15  # multiplier precision (fits exact-f64 evaluation headroom)


def quantize_multiplier(c1: float) -> tuple[int, int]:
    """c1 -> (M, S) with c1 ~= M / 2**S and M in [2**14, 2**15)."""
    c1 = float(c1)
    if c1 == 0.0 or not math.isfinite(c1):
        return 0, 0
    frac, exp = math.frexp(c1)  # c1 = frac * 2**exp, frac in [0.5, 1)
    m = round(frac * (1 << _MBITS))
    if m == (1 << _MBITS):  # rounding overflowed into the next octave
        m >>= 1
        exp += 1
    return m, _MBITS - exp


def quantize_multipliers(c1_vec) -> tuple[np.ndarray, np.ndarray]:
    pairs = [quantize_multiplier(c) for c in np.atleast_1d(c1_vec)]
    return (np.array([p[0] for p in pairs], np.float32),
            np.array([p[1] for p in pairs], np.int32))


def requant_fixed(q, bias_q, m, shift, out_zp, activation, out_scale):
    """Integer requant: ``out_zp + rshift_round((q + bias_q) * M, S)``,
    rounding half away from zero, saturated to int8 with the activation
    folded into the bounds.  Operands are integer-valued, carried in the
    widest available float (see module docstring)."""
    f = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    p = (q.astype(f) + bias_q.astype(f)) * m.astype(f)
    half = jnp.exp2(shift.astype(f) - 1.0)
    div = jnp.exp2(shift.astype(f))
    mag = jnp.floor((jnp.abs(p) + half) / div)  # round half away from zero
    y = jnp.sign(p) * mag + np.float32(out_zp)
    lo, hi = -128.0, 127.0
    if activation is FusedActivation.RELU:
        lo = float(out_zp)
    elif activation is FusedActivation.RELU6:
        lo, hi = float(out_zp), min(127.0, float(quantize_scalar(6.0, out_scale, out_zp)))
    return jnp.clip(y, lo, hi).astype(jnp.int8)


def derive_bias_q(c0, c1_vec) -> jax.Array:
    """bias in accumulator scale: round(C0 / C1) (exact when
    bias_scale == in_scale * w_scale, as real converters guarantee)."""
    c1 = jnp.asarray(np.atleast_1d(c1_vec), jnp.float32)
    return jnp.round(jnp.asarray(c0, jnp.float32) / c1)
