"""Fused int8 GEMM + requantization + activation Pallas kernel.

This is the engine's hot kernel: FullyConnected runs through it directly
and Conv2D runs through it after im2col (1x1 convs -- 14 of person_detect's
31 layers -- are *exactly* this GEMM).  One MXU pass produces int32
accumulators that are requantized and activated in-register before a
single int8 store, so no i32 tensor ever round-trips through HBM.

Math (bit-identical to reference ``src/ops/fully_connected.rs:82-120`` /
``conv_2d.rs:100-133`` via the pad-by-zero-point identity, see
``core/tensor.py``):

    acc[m,n] = sum_k X[m,k] * W[k,n]                       (int8 MXU, i32 acc)
    q[m,n]   = acc - rowsum(X)[m] * wzp[n] + d[n]          (i32, exact)
    y[m,n]   = roundf(bias0[n] + c1[n] * f32(q))           (f32, VPU)
    out      = sat_cast_i8(y) |> fused ReLU/ReLU6          (int8)

where d[n] = K * in_zp * wzp[n] - in_zp * colsum(W)[n] folds every
zero-point correction into one per-column constant.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.activation import FusedActivation, quantize_scalar
from ..core.numerics import round_up
from . import config


def _qgemm_kernel(
    x_ref, w_ref, wzp_ref, d_ref, bias0_ref, c1_ref, o_ref, *, act, out_zp, six
):
    x = x_ref[:]  # [TM, K] int8
    acc = jnp.dot(x, w_ref[:], preferred_element_type=jnp.int32)  # [TM, TN]
    rowsum = jnp.sum(x.astype(jnp.int32), axis=1, keepdims=True)  # [TM, 1]
    q = acc - rowsum * wzp_ref[:] + d_ref[:]
    y = lax.round(
        bias0_ref[:] + c1_ref[:] * q.astype(jnp.float32),
        lax.RoundingMethod.AWAY_FROM_ZERO,
    )
    # activation folded into the f32 saturation bounds (int8 max/min does
    # not legalize on v5e Mosaic): sat_cast∘relu(zp) == clip(y, zp, 127)
    lo, hi = -128.0, 127.0
    if act is FusedActivation.RELU:
        lo = float(out_zp)
    elif act is FusedActivation.RELU6:
        lo, hi = float(out_zp), min(127.0, float(six))
    o_ref[:] = jnp.clip(y, lo, hi).astype(jnp.int8)


@functools.partial(
    jax.jit,
    static_argnames=("activation", "out_scale", "out_zp", "tile_m", "tile_n"),
)
def qgemm(
    x: jax.Array,  # [M, K] int8
    w: jax.Array,  # [K, N] int8
    wzp: jax.Array,  # [N] i32 per-column weight zero points
    d: jax.Array,  # [N] i32 folded zero-point correction
    bias0: jax.Array,  # [N] f32 = out_zp + C0
    c1: jax.Array,  # [N] f32 requant multipliers
    *,
    activation: FusedActivation,
    out_scale: float,
    out_zp: int,
    tile_m: int = 256,
    tile_n: int = 128,
) -> jax.Array:
    M, K = x.shape
    _, N = w.shape
    six = quantize_scalar(6.0, out_scale, out_zp) if activation is FusedActivation.RELU6 else 0

    tile_m = min(tile_m, round_up(M, 32))
    tile_n = min(tile_n, round_up(N, 128))
    Mp, Kp, Np = round_up(M, tile_m), round_up(K, 128), round_up(N, tile_n)
    # zero-pad: padded K contributes 0*0 to acc and 0 to rowsum -> exact
    xp = jnp.pad(x, ((0, Mp - M), (0, Kp - K)))
    wp = jnp.pad(w, ((0, Kp - K), (0, Np - N)))
    row = lambda v, dt: jnp.pad(jnp.asarray(v, dt), (0, Np - N)).reshape(1, Np)

    grid = (Mp // tile_m, Np // tile_n)
    out = pl.pallas_call(
        functools.partial(_qgemm_kernel, act=activation, out_zp=out_zp, six=six),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, Kp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp, tile_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, tile_n), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), jnp.int8),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Kp * Np,
            bytes_accessed=Mp * Kp + Kp * Np + Mp * Np,
            transcendentals=0,
        ),
        interpret=config.interpret(),
    )(
        xp,
        wp,
        row(wzp, jnp.int32),
        row(d, jnp.int32),
        row(bias0, jnp.float32),
        row(c1, jnp.float32),
    )
    return out[:M, :N]
