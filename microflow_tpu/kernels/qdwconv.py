"""Fused int8 DepthwiseConv2D + requant + activation Pallas kernel.

Depthwise convs are bandwidth-bound (no channel contraction), so the win
is doing the whole shift-multiply-accumulate + requant + activation in
VMEM with one int8 load and one int8 store per element.  The input
arrives already padded with ``in_zp`` (see ``core/tensor.py`` for why that
makes every SAME-padding correction vanish); weights arrive centered
(``w - w_zp[c]``, i32) so the only remaining correction is the constant
``d[c] = -in_zp * sum_mn wc[m,n,c]`` folded on the host.

    q[b,i,j,c] = sum_mn x[b, sr*i+m, sc*j+n, c] * wc[m,n,c] + d[c]
    y = roundf(bias0[c] + c1[c] * f32(q)) |> sat-cast |> ReLU/ReLU6

Strides are handled by *phase decomposition at the XLA level*: the padded
input is split into sr*sc interleaved phase planes, so the kernel only
ever takes unit-stride slices (Mosaic rejects strided vector slices, and
dynamic offsets are only legal on untiled dims -- phases put every
dynamic index on an untiled dim).  Grid: batch tiles x channel tiles,
full spatial extent in VMEM (MobileNet-scale spatial extents are tiny).
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
from ..core.numerics import cdiv, round_up
from . import config


def _qdwconv_kernel(
    x_ref, wc_ref, d_ref, bias0_ref, c1_ref, o_ref, *, kh, kw, sr, sc, oh, ow, act, out_zp, six
):
    # x_ref: [S, TB, H2, W2, TC] phase-decomposed padded input
    _, tb, _, _, tc = x_ref.shape

    def tap_row(m, acc):
        """Accumulate all kw taps of filter row m.  fori_loop over kh keeps
        only one window slice live (a 10x8 kernel fully unrolled to 80
        taps overflows the VMEM scratch budget); kw is Python-unrolled so
        the W (sublane) offsets stay static, as Mosaic requires."""
        a, i0 = m % sr, m // sr
        for n in range(kw):
            b, j0 = n % sc, n // sc
            p = a * sc + b
            xs = x_ref[pl.ds(p, 1), :, pl.ds(i0, oh), j0 : j0 + ow, :]  # [1,TB,OH,OW,TC]
            w = wc_ref[pl.ds(m, 1), n, :]  # [1, TC]
            acc = acc + xs[0].astype(jnp.int32) * w[0][None, None, None, :]
        return acc

    acc = lax.fori_loop(0, kh, tap_row, jnp.zeros((tb, oh, ow, tc), jnp.int32))
    q = acc + d_ref[0, :][None, None, None, :]
    y = lax.round(
        bias0_ref[0, :][None, None, None, :]
        + c1_ref[0, :][None, None, None, :] * q.astype(jnp.float32),
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
    static_argnames=(
        "kh", "kw", "sr", "sc", "oh", "ow", "activation", "out_scale", "out_zp", "tile_b", "tile_c",
    ),
)
def qdwconv(
    xp: jax.Array,  # [B, HP, WP, C] int8, already padded with in_zp
    wc: jax.Array,  # [KH, KW, C] i32 centered weights (w - w_zp)
    d: jax.Array,  # [C] i32 = -in_zp * sum(wc)
    bias0: jax.Array,  # [C] f32
    c1: jax.Array,  # [C] f32
    *,
    kh: int, kw: int, sr: int, sc: int, oh: int, ow: int,
    activation: FusedActivation,
    out_scale: float,
    out_zp: int,
    tile_b: int = 8,
    tile_c: int = 128,
) -> jax.Array:
    B, HP, WP, C = xp.shape
    six = quantize_scalar(6.0, out_scale, out_zp) if activation is FusedActivation.RELU6 else 0

    tile_c = min(tile_c, round_up(C, 128))
    # phase planes must each cover (kh-1)//sr + oh rows ((kw-1)//sc + ow
    # cols); pad the source so every phase has that many (padding values
    # land outside every window and are never read)
    h2 = max(cdiv(HP, sr), (kh - 1) // sr + oh)
    w2 = max(cdiv(WP, sc), (kw - 1) // sc + ow)
    # VMEM-aware batch tile: input block + ~3 i32 output-sized temps per
    # sample must fit the ~16 MB VMEM (leave headroom for double buffering)
    per_sample = sr * sc * h2 * w2 * tile_c + 3 * 4 * oh * ow * tile_c
    tile_b = max(1, min(tile_b, B, (10 * 2**20) // per_sample))
    Bp, Cp = round_up(B, tile_b), round_up(C, tile_c)
    xpp = jnp.pad(xp, ((0, Bp - B), (0, sr * h2 - HP), (0, sc * w2 - WP), (0, Cp - C)))
    phases = jnp.stack(
        [xpp[:, a::sr, b::sc, :] for a in range(sr) for b in range(sc)], axis=0
    )  # [S, Bp, h2, w2, Cp]
    s = sr * sc
    wcp = jnp.pad(wc, ((0, 0), (0, 0), (0, Cp - C)))
    row = lambda v, dt: jnp.pad(jnp.asarray(v, dt), (0, Cp - C)).reshape(1, Cp)

    grid = (Bp // tile_b, Cp // tile_c)
    out = pl.pallas_call(
        functools.partial(
            _qdwconv_kernel,
            kh=kh, kw=kw, sr=sr, sc=sc, oh=oh, ow=ow,
            act=activation, out_zp=out_zp, six=six,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (s, tile_b, h2, w2, tile_c), lambda i, j: (0, i, 0, 0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((kh, kw, tile_c), lambda i, j: (0, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_c), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_c), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_c), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_b, oh, ow, tile_c), lambda i, j: (i, 0, 0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, oh, ow, Cp), jnp.int8),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * oh * ow * kh * kw * Cp,
            bytes_accessed=Bp * HP * WP * Cp + Bp * oh * ow * Cp,
            transcendentals=0,
        ),
        interpret=config.interpret(),
    )(phases, wcp, row(d, jnp.int32), row(bias0, jnp.float32), row(c1, jnp.float32))
    return out[:B, :, :, :C]
