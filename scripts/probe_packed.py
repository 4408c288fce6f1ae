#!/usr/bin/env python
"""Probe Mosaic legality + throughput of the packed-pipeline primitives.

The round-2 perf design (docs/PERFORMANCE.md "packed pipeline") runs the
whole person_detect model in one Pallas kernel in a [TB, H, W*C] layout:
lanes = W*C (multiples of 128 at every layer -> zero tile padding),
batch purely major (small TB wastes nothing).  dw = 9 lane-rolled VPU
FMA taps with masked weight planes; pw = lane-chunked block-diagonal
int8 MXU matmuls.  This script probes, on real hardware:

  P1  lane-dim split/collapse reshapes (minor multiple of 128)
  P2  pltpu.roll on the lane axis (int8 + f32), correctness
  P3  VPU f32 FMA throughput (ops/cycle)
  P4  MXU int8 [M,128]@[128,256] -> i32 throughput
  P5  requant chain (FMA+round+clip+cast) throughput
  P6  full dw-layer prototype in the packed layout vs numpy oracle

Timing: axon relay quirks (see CLAUDE.md) -- all repeats run inside ONE
jit via lax.fori_loop with a data-dependent carry; a host readback is
the barrier.
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.normpath(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")))

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CLOCK = 0.94e9  # v5e nominal



def lroll(x, shift, axis):
    """pltpu.roll with negative shifts mapped to size-shift."""
    n = x.shape[axis]
    return pltpu.roll(x, shift=shift % n, axis=axis)

def run_looped(fn, x, iters, name):
    """fn: x -> same-shape x.  Returns seconds per call."""
    @jax.jit
    def loop(x):
        return lax.fori_loop(0, iters, lambda i, v: fn(v), x)

    y = loop(x)
    _ = np.asarray(y).reshape(-1)[0]  # compile + settle
    t0 = time.time()
    y = loop(x)
    _ = np.asarray(y).reshape(-1)[0]
    dt = (time.time() - t0 - 0.002) / iters
    print(f"{name}: {dt*1e6:.2f} us/call")
    return dt


def vmem_call(kernel, x, out_shape=None, extra=()):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape if out_shape is None else out_shape.shape,
                                       x.dtype if out_shape is None else out_shape.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + len(extra)),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, *extra)


def p1_reshapes():
    print("== P1 lane split/collapse reshapes ==")

    def split_collapse(ref, o):
        x = ref[:]  # [8, 48, 384] f32
        y = x.reshape(8, 48, 3, 128)  # split lanes, minor 128
        z = y + 1.0
        o[:] = z.reshape(8, 48, 384)  # collapse back

    x = jnp.arange(8 * 48 * 384, dtype=jnp.float32).reshape(8, 48, 384) % 7
    try:
        y = vmem_call(split_collapse, x)
        ok = np.array_equal(np.asarray(y), np.asarray(x) + 1)
        print(f"  f32 [8,48,384]<->[8,48,3,128]: compiles, correct={ok}")
    except Exception as e:
        print(f"  f32 split/collapse FAILED: {str(e)[:200]}")

    def split_collapse_i8(ref, o):
        x = ref[:]
        y = x.reshape(8, 48, 3, 128)
        o[:] = y.reshape(8, 48, 384)

    xi = (jnp.arange(8 * 48 * 384, dtype=jnp.int32) % 250 - 120).astype(jnp.int8).reshape(8, 48, 384)
    try:
        y = vmem_call(split_collapse_i8, xi)
        print(f"  int8 split/collapse: compiles, correct={np.array_equal(np.asarray(y), np.asarray(xi))}")
    except Exception as e:
        print(f"  int8 split/collapse FAILED: {str(e)[:200]}")

    # collapse majors into a 2D matmul view: [8,48,3,128] -> [8*48*3, 128]
    def collapse2d(ref, o):
        x = ref[:].reshape(8 * 48 * 3, 128)
        o[:] = (x + 1.0).reshape(8, 48, 384)

    try:
        y = vmem_call(collapse2d, x)
        print(f"  f32 ->2D [1152,128]: compiles, correct={np.array_equal(np.asarray(y), np.asarray(x)+1)}")
    except Exception as e:
        print(f"  ->2D FAILED: {str(e)[:200]}")


def p2_roll():
    print("== P2 lane rolls ==")
    H, WC = 48, 384
    xi = (np.arange(8 * H * WC) % 251 - 125).astype(np.int8).reshape(8, H, WC)

    for dtype, xin in (("int8", xi), ("f32", xi.astype(np.float32))):
        def roll_k(ref, o):
            x = ref[:]
            o[:] = lroll(x, 8, 2) + lroll(x, -8, 2)

        try:
            y = vmem_call(roll_k, jnp.asarray(xin))
            want = np.roll(xin, 8, axis=2) + np.roll(xin, -8, axis=2)
            ok = np.array_equal(np.asarray(y), want)
            print(f"  {dtype} roll +-8 lanes: compiles, correct={ok}")
        except Exception as e:
            print(f"  {dtype} roll FAILED: {str(e)[:200]}")

    # roll cost: 18 rolls of a [8, 48, 384] f32 slab per call
    xf = jnp.asarray(xi.astype(np.float32))

    def many_rolls(ref, o):
        x = ref[:]
        acc = x
        for s in range(1, 10):
            acc = acc + lroll(x, s * 8, 2) + lroll(x, -s * 8, 2)
        o[:] = acc * (1.0 / 19.0)

    f = lambda v: vmem_call(many_rolls, v)
    dt = run_looped(f, xf, 400, "  18 rolls + 18 adds on [8,48,384] f32")
    vregs = 8 * 48 * 384 / 1024
    print(f"    -> {dt*CLOCK/ (36*vregs):.2f} cycles per roll-vreg-op (rolls+adds)")


def p3_vpu_fma():
    print("== P3 VPU f32 FMA throughput ==")
    x = jnp.ones((256, 1024), jnp.float32) * 1.00001
    K = 64

    def fma_k(ref, o):
        v = ref[:]
        acc = v * 1.0001
        for k in range(1, K):
            acc = acc + v * (1.0 + k * 1e-6)
        o[:] = acc * (1.0 / K)

    f = lambda v: vmem_call(fma_k, v)
    dt = run_looped(f, x, 300, f"  {K} FMA over [256,1024] f32")
    vregs = 256 * 1024 / 1024
    total_ops = K * vregs  # counting each mul+add pair as one FMA slot
    print(f"    -> {total_ops/(dt*CLOCK):.2f} FMA-vreg-ops/cycle")


def p3b_vpu_i32():
    print("== P3b VPU int32 mul+add throughput ==")
    x = jnp.ones((256, 1024), jnp.int32)
    K = 64

    def mac_k(ref, o):
        v = ref[:]
        acc = v * 3
        for k in range(1, K):
            acc = acc + v * (3 + k)
        o[:] = acc // (K * 5)

    f = lambda v: vmem_call(mac_k, v)
    dt = run_looped(f, x, 300, f"  {K} int32 mul+add over [256,1024]")
    vregs = 256 * 1024 / 1024
    print(f"    -> {K*vregs/(dt*CLOCK):.2f} mac-vreg-ops/cycle")


def p4_mxu():
    print("== P4 MXU int8 chunked matmul ==")
    M, K, N = 1152, 128, 256
    a = (np.arange(M * K) % 250 - 120).astype(np.int8).reshape(M, K)
    b = (np.arange(K * N) % 249 - 120).astype(np.int8).reshape(K, N)
    R = 16

    def mm_k(a_ref, b_ref, o):
        acc = jnp.zeros((M, N), jnp.int32)
        for r in range(R):
            acc = acc + jax.lax.dot_general(
                a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        o[:] = acc

    try:
        call = lambda: pl.pallas_call(
            mm_k,
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(jnp.asarray(a), jnp.asarray(b))
        y = call()
        want = a.astype(np.int32) @ b.astype(np.int32) * R
        print(f"  int8 dot -> i32: correct={np.array_equal(np.asarray(y), want)}")
        # time it
        ja, jb = jnp.asarray(a), jnp.asarray(b)

        @jax.jit
        def loop(a0):
            def body(i, v):
                r = pl.pallas_call(
                    mm_k,
                    out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                )(v, jb)
                return (v + r[:1, :K].astype(jnp.int8) * 0)
            return lax.fori_loop(0, 100, body, a0)

        y = loop(ja); _ = np.asarray(y)[0, 0]
        t0 = time.time(); y = loop(ja); _ = np.asarray(y)[0, 0]
        dt = (time.time() - t0 - 0.002) / 100
        slots = R * M * K * N
        print(f"  {R}x [{M},{K}]@[{K},{N}] i8: {dt*1e6:.1f} us/call -> {slots/dt/1e12:.1f} TMAC-slots/s")
    except Exception as e:
        print(f"  MXU int8 dot FAILED: {str(e)[:300]}")


def p5_requant():
    print("== P5 requant chain ==")
    x = jnp.ones((256, 1024), jnp.float32) * 123.4
    R = 32

    def rq_k(ref, o):
        v = ref[:]
        acc = jnp.zeros_like(v)
        for r in range(R):
            y = lax.round(0.5 + (0.01 + r * 1e-5) * v, lax.RoundingMethod.AWAY_FROM_ZERO)
            y = jnp.clip(y, -128.0, 127.0)
            acc = acc + y.astype(jnp.int8).astype(jnp.float32)
        o[:] = acc * (1.0 / R)

    f = lambda v: vmem_call(rq_k, v)
    dt = run_looped(f, x, 200, f"  {R} requant chains over [256,1024]")
    vregs = 256
    print(f"    -> {dt*CLOCK/(R*vregs):.2f} cycles per requant-vreg")


def p6_dw_prototype():
    print("== P6 dw layer prototype (packed layout) ==")
    TB, H, W, C = 8, 48, 48, 8
    WC = W * C
    rng = np.random.default_rng(0)
    x = rng.integers(-128, 128, (TB, H, WC), dtype=np.int8)
    k = rng.integers(-127, 128, (3, 3, C), dtype=np.int8)
    in_zp = -1

    # weight planes [1,1,WC] per tap, masked at W edges; corr plane [H, WC]
    planes = np.zeros((3, 3, WC), np.float32)
    for dh in range(3):
        for dw in range(3):
            for w in range(W):
                if 0 <= w + dw - 1 < W:
                    planes[dh, dw, w * C:(w + 1) * C] = k[dh, dw]
    # oracle: SAME conv, pad with in_zp
    xp = np.full((TB, H + 2, W + 2, C), in_zp, np.int32)
    xp[:, 1:-1, 1:-1] = x.reshape(TB, H, W, C)
    want = np.zeros((TB, H, W, C), np.int64)
    for dh in range(3):
        for dw in range(3):
            want += xp[:, dh:dh + H, dw:dw + W] * k[dh, dw].astype(np.int64)
    want = want.reshape(TB, H, WC)

    # corr: contributions of out-of-bounds taps at value in_zp
    corr = np.zeros((H, WC), np.float32)
    for dh in range(3):
        for dw in range(3):
            for h in range(H):
                hh = h + dh - 1
                for w in range(W):
                    ww = w + dw - 1
                    if not (0 <= hh < H) or not (0 <= ww < W):
                        corr[h, w * C:(w + 1) * C] += k[dh, dw] * in_zp

    jplanes = jnp.asarray(planes)
    jcorr = jnp.asarray(corr)

    def dw_k(x_ref, o):
        xf = x_ref[:].astype(jnp.float32)  # [TB, H, WC]
        acc = jnp.broadcast_to(jcorr[None], (TB, H, WC))
        for dh in range(3):
            # shift along H (majors): rows h+dh-1; OOB handled by corr, so
            # shifted-in garbage rows must be masked -> use slice+pad rows
            if dh == 0:
                shifted = jnp.concatenate([jnp.zeros((TB, 1, WC), jnp.float32), xf[:, :-1]], axis=1)
            elif dh == 1:
                shifted = xf
            else:
                shifted = jnp.concatenate([xf[:, 1:], jnp.zeros((TB, 1, WC), jnp.float32)], axis=1)
            for dw in range(3):
                if dw == 0:
                    rolled = lroll(shifted, C, 2)
                elif dw == 1:
                    rolled = shifted
                else:
                    rolled = lroll(shifted, -C, 2)
                acc = acc + rolled * jplanes[dh, dw][None, None, :]
        o[:] = acc

    try:
        f = lambda v: pl.pallas_call(
            dw_k,
            out_shape=jax.ShapeDtypeStruct((TB, H, WC), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(v)
        y = np.asarray(f(jnp.asarray(x)))
        ok = np.array_equal(y.astype(np.int64), want)
        print(f"  dw taps via roll+FMA: correct={ok}")
        if not ok:
            d = np.abs(y.astype(np.int64) - want)
            print(f"    max err {d.max()} at {np.unravel_index(d.argmax(), d.shape)}")
        # time: per-call cost for TB=8 samples
        xj = jnp.asarray(x)

        @jax.jit
        def loop(v):
            def body(i, v):
                r = f(v)
                return (v + r[:, :1, :1].astype(jnp.int8) * 0).astype(jnp.int8)
            return lax.fori_loop(0, 200, body, v)

        yv = loop(xj); _ = int(np.asarray(yv)[0, 0, 0])
        t0 = time.time(); yv = loop(xj); _ = int(np.asarray(yv)[0, 0, 0])
        dt = (time.time() - t0 - 0.002) / 200
        print(f"  dw L1-like [8,48,384]: {dt*1e6:.2f} us/call = {dt/TB*1e9:.1f} ns/sample")
    except Exception as e:
        print(f"  dw prototype FAILED: {str(e)[:300]}")


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}")
    p1_reshapes()
    p2_roll()
    p3_vpu_fma()
    p3b_vpu_i32()
    p4_mxu()
    p5_requant()
    p6_dw_prototype()
