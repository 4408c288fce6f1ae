#!/usr/bin/env python
"""Round-5 MXU/VPU overlap experiments (VERDICT round-4, task 1).

The prize: the flat kernel's in-situ ablation (docs/PERFORMANCE.md
round 3) brackets a ~1.4M inf/s flagship rate if the VPU requant could
hide under the MXU dots (raw = 4.31 ms vs exact = 8.10 ms @6144).  The
software-pipeline depth experiment (1 vs 3: ~1%) varied how many dot
groups are issued ahead of their requants WITHIN one stream.  This
script measures the two remaining untried forms:

(a) XLA-level concurrency: the batch split into two half-batch
    ``pallas_call``s with no data dependency, dispatched inside one jit
    -- does the TPU runtime interleave kernel A's VPU epilogue with
    kernel B's MXU dots?  (Expectation per XLA's execution model: a
    TensorCore runs one program at a time, so no -- but measured, not
    presumed.)

(b) Source-level two-stream interleave INSIDE one kernel body: the
    batch tile is split into two row-halves, each running the full
    layer chain independently, and their (dot, requant) thunks are
    emitted round-robin -- program order alternates MXU and VPU ops
    from chains with NO data dependence on each other, so an
    in-order-per-unit scheduler that can run the units asynchronously
    has both fed at every point.  Bit-exactness asserted vs the
    production kernel.

(c) grid dimension_semantics="parallel" vs default ("arbitrary") on
    the production kernel -- does declaring grid-step independence
    change Mosaic's schedule?

Usage: probe_overlap2.py [B] [ITERS] [tb] [--model PATH]
"""

import os
import sys
import time

sys.path.insert(0, os.path.normpath(os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..")))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from microflow_tpu.frontend.parser import parse
from microflow_tpu.kernels.flatpack import LANE, build_flat_kernel, plan_flat

args = sys.argv[1:]
MODEL = "models/person_detect.tflite"
if "--model" in args:
    i = args.index("--model")
    MODEL = args[i + 1]
    del args[i : i + 2]
B = int(args[0]) if args else 6144
ITERS = int(args[1]) if len(args) > 1 else 50
TB = int(args[2]) if len(args) > 2 else 768

graph = parse(MODEL)


def build_halves_kernel(graph, tb):
    """Variant (b): same plan/consts as the production exact2 kernel,
    body = two independent row-half streams, thunks interleaved."""
    plan = plan_flat(graph)
    if plan is None:
        return None
    ops, n_layers, meta = plan

    consts = []

    def add_const(arr):
        consts.append(jnp.asarray(arr))
        return len(consts) - 1

    for op in ops:
        op._m_idx = [add_const(m) for m in op.mats]
        op._t_idx = [add_const(p) for p in op.tap_planes]
        if op.kind == "softmax":
            op._sm_idx = add_const(op.sm_mask)
            continue
        if op.epi == "pool":
            op._r_idx = add_const(op.r_plane)
            op._b_idx = add_const(op.bias_plane)
            op._c_idx = add_const(op.c1_plane)
        else:
            op._d_idx = add_const(op.d_plane)
            op._b_idx = add_const(op.bias_plane)
            op._c_idx = add_const(op.c1_plane)

    in_lanes_p, out_lanes_p = meta["in_lanes_p"], meta["out_lanes_p"]
    scratch_lanes = (max(op.lanes_out_p for op in ops[:-1])
                     if len(ops) > 1 else LANE)

    def kernel(x_ref, *refs):
        crefs = refs[: len(consts)]
        out_ref = refs[len(consts)]
        s0, s1 = refs[len(consts) + 1], refs[len(consts) + 2]

        def stream(r0, r1):
            """Yield ('mxu'|'vpu', thunk) for one row-half's full chain.
            Exact2 epilogue only -- the production default."""
            src = x_ref
            for li, op in enumerate(ops):
                dst = (out_ref if li == len(ops) - 1
                       else (s0 if li % 2 == 0 else s1))

                if op.kind == "softmax":
                    def t_sm(op=op, src=src, dst=dst):
                        mref = crefs[op._sm_idx]
                        x8 = src[r0:r1, 0:LANE]
                        e = x8.astype(jnp.float32) * np.float32(op.sm_in_scale)
                        ex = jnp.exp(e) * mref[0:1, :]
                        total = jnp.sum(ex, axis=1, keepdims=True)
                        y = (ex / total / np.float32(op.sm_out_scale)
                             + np.float32(op.out_zp))
                        y = lax.round(y, lax.RoundingMethod.AWAY_FROM_ZERO)
                        y = jnp.clip(y, -128.0, 127.0)
                        dst[r0:r1, 0:LANE] = y.astype(jnp.int8)
                    yield ("vpu", t_sm)
                    src = dst
                    continue

                def requant(out_lo, ncols, acc, op=op, dst=dst):
                    if op.epi == "pool":
                        rref = crefs[op._r_idx]
                        bref = crefs[op._b_idx]
                        cref = crefs[op._c_idx]
                        t = (rref[0:1, out_lo : out_lo + ncols]
                             * acc.astype(jnp.float32))
                        y = (cref[0:1, out_lo : out_lo + ncols] * t
                             + bref[0:1, out_lo : out_lo + ncols])
                        y = lax.round(y, lax.RoundingMethod.AWAY_FROM_ZERO)
                        y = jnp.clip(y, max(op.clip_lo, -128.0),
                                     min(op.clip_hi, 127.0))
                        dst[r0:r1, out_lo : out_lo + ncols] = y.astype(jnp.int8)
                        return
                    dref = crefs[op._d_idx]
                    bref = crefs[op._b_idx]
                    cref = crefs[op._c_idx]
                    q = acc + dref[0:1, out_lo : out_lo + ncols]
                    y = (bref[0:1, out_lo : out_lo + ncols]
                         + cref[0:1, out_lo : out_lo + ncols]
                         * q.astype(jnp.float32))
                    t = y + jnp.where(y >= 0, np.float32(0.5), np.float32(-0.5))
                    if op.clip_lo > -128.0 or op.clip_hi < 127.0:
                        t = jnp.clip(t, op.clip_lo, op.clip_hi)
                    dst[r0:r1, out_lo : out_lo + ncols] = t.astype(jnp.int8)

                if op.kind == "taps":
                    cover = sorted({lo for lo, _ in op.tap_ranges}
                                   | {hi for _, hi in op.tap_ranges})
                    for a, b in zip(cover, cover[1:]):
                        def t_tap(a=a, b=b, op=op, src=src, requant=requant):
                            acc = None
                            for shift, pidx, (lo, hi) in zip(
                                    op.taps, op._t_idx, op.tap_ranges):
                                if lo > a or hi < b:
                                    continue
                                pref = crefs[pidx]
                                sl = src[r0:r1, a + shift : b + shift].astype(jnp.int32)
                                term = sl * pref[0:1, a:b]
                                acc = term if acc is None else acc + term
                            if acc is not None:
                                requant(a, b - a, acc)
                        yield ("vpu", t_tap)
                else:
                    for out_lo, parts in op.groups:
                        cell = {}
                        def t_dot(out_lo=out_lo, parts=parts, op=op,
                                  src=src, cell=cell):
                            acc = None
                            ncols = None
                            for lo, cid in parts:
                                mat = crefs[op._m_idx[cid]]
                                ncols = mat.shape[1]
                                win = src[r0:r1, lo : lo + mat.shape[0]]
                                a = lax.dot_general(
                                    win, mat[:], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
                                acc = a if acc is None else acc + a
                            cell["v"] = (out_lo, ncols, acc)
                        def t_req(cell=cell, requant=requant):
                            requant(*cell["v"])
                        yield ("mxu", t_dot)
                        yield ("vpu", t_req)
                src = dst

        # round-robin interleave of the two independent halves
        sa, sb = stream(0, tb // 2), stream(tb // 2, tb)
        import itertools
        for pair in itertools.zip_longest(sa, sb):
            for item in pair:
                if item is not None:
                    item[1]()

    def flat_fn(xq):
        b = xq.shape[0]
        in_specs = [pl.BlockSpec((tb, in_lanes_p), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)]
        for carr in consts:
            zeros = (0,) * carr.ndim
            in_specs.append(pl.BlockSpec(carr.shape, lambda i, z=zeros: z,
                                         memory_space=pltpu.VMEM))
        xp = xq
        if meta["in_off"]:
            xp = jnp.pad(xq, ((0, 0), (meta["in_off"],
                                       in_lanes_p - meta["in_lanes"] - meta["in_off"])))
        elif in_lanes_p != -(-meta["in_lanes"] // 128) * 128:
            xp = jnp.pad(xq, ((0, 0), (0, in_lanes_p - meta["in_lanes"])))
        return pl.pallas_call(
            kernel,
            grid=(b // tb,),
            out_shape=jax.ShapeDtypeStruct((b, out_lanes_p), jnp.int8),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((tb, out_lanes_p), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((tb, scratch_lanes), jnp.int8),
                            pltpu.VMEM((tb, scratch_lanes), jnp.int8)],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        )(xp, *consts)

    return flat_fn, n_layers, meta


def timeit(name, fn, xq):
    @jax.jit
    def chain(x):
        y = fn(x)
        bump = y[:, :1].astype(jnp.int8)
        return (x + bump).astype(jnp.int8), y

    t0 = time.time()
    x, y = chain(xq)
    _ = int(np.asarray(y[0, 0]))
    comp_t = time.time() - t0
    best = None
    for _ in range(3):
        t0 = time.time()
        for _ in range(ITERS):
            x, y = chain(x)
        _ = int(np.asarray(y[0, 0]))
        dt = (time.time() - t0) / ITERS * 1e3
        best = dt if best is None else min(best, dt)
    print(f"{name}: compile {comp_t:.1f}s -> {best:7.3f} ms/batch "
          f"({B/best*1e3:,.0f} inf/s)", flush=True)
    return best


xq = jax.device_put(jax.random.randint(
    jax.random.PRNGKey(0), (B, int(np.prod(graph.input_shape))), -128, 128,
    dtype=jnp.int8))

# --- baseline: production kernel --------------------------------------------
base_fn, n_layers, meta = build_flat_kernel(graph, tb=TB, requant="exact2")
want = np.asarray(base_fn(xq))
t_base = timeit(f"baseline tb={TB}", base_fn, xq)

# --- (a) two half-batch pallas_calls, no data dependency --------------------
def two_calls(x):
    h = x.shape[0] // 2
    return jnp.concatenate([base_fn(x[:h]), base_fn(x[h:])])

got_a = np.asarray(jax.jit(two_calls)(xq))
print("(a) bit-exact:", np.array_equal(got_a, want))
t_a = timeit("(a) 2x half-batch pallas_calls", two_calls, xq)

# --- (b) two-stream interleaved kernel body ----------------------------------
res = build_halves_kernel(graph, tb=TB)
if res is None:
    print("(b): no plan")
else:
    half_fn, _, _ = res
    got_b = np.asarray(half_fn(xq))
    print("(b) bit-exact:", np.array_equal(got_b, want))
    t_b = timeit("(b) two-stream interleave", half_fn, xq)

# --- (c) dimension_semantics="parallel" --------------------------------------
try:
    import functools
    import microflow_tpu.kernels.flatpack as fp

    orig = pltpu.CompilerParams
    def patched(**kw):
        kw.setdefault("dimension_semantics", ("parallel",))
        return orig(**kw)
    pltpu.CompilerParams = patched
    try:
        par_fn, _, _ = build_flat_kernel(graph, tb=TB, requant="exact2")
        got_c = np.asarray(par_fn(xq))
        print("(c) bit-exact:", np.array_equal(got_c, want))
        t_c = timeit('(c) dimension_semantics=parallel', par_fn, xq)
    finally:
        pltpu.CompilerParams = orig
except Exception as e:
    print(f"(c) failed: {type(e).__name__}: {e}")
