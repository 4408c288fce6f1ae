"""Column-FC Pallas kernel: batch on LANES, features on sublanes.

Round-5 frontier for tiny-FC chains (sine: 1 -> 16 -> 16 -> 1,
``tests/sine.rs:8-12`` golden; round-4 VERDICT task 4).  The flat
kernel's sample-on-lanes layout wastes a 128-wide MXU window per K<=16
matmul (measured 0.56x XLA, docs/PERFORMANCE.md round 3).  This kernel
flips the layout: activations live as ``[width, L]`` int8 -- feature j
on sublane j, L = tb*128 batch lanes -- so every FullyConnected becomes
K broadcast-MACs of full [N, L] tiles (VPU-dense for N >= 8, zero MXU
involvement, no 128-lane window rounding):

Measured outcome (v5e, scripts/ab_colfc.py, B=524288, same-process,
bit-exact): **1.46-1.57B inf/s (0.64-0.69 ns/sample)** -- above the
round-4 recorded XLA frontier (1.29-1.42B) but BELOW XLA measured in
the same hot-clock process (1.77-2.12B, 0.47-0.56 ns/sample -- at the
dense-slot model's 0.46 ns floor).  XLA's batch-minor fused VPU
pipeline stays the production path for pure-FC graphs (``auto`` ->
xla); this kernel is kept as the experimental ``colfc`` backend --
the measured design of record for the batch-on-lanes idea
(docs/PERFORMANCE.md round 5).

    acc[N, L] = sum_k  x_i32[k:k+1, :] * W_T[:, k:k+1]      (K ops)
    y = exact2-requant(acc + d)                              (per layer)

Integer algebra is the engine's exact recipe (reference R6,
``src/ops/fully_connected.rs:64-122``): with w_zp == 0 the 4-constant
decomposition collapses to ``q = acc + d``, ``d = -in_zp * colsum(W)``
(same collapse as ``kernels/flatpack._fc_taps``), then the trunc-folded
round-away cast (``scripts/probe_cast.py`` semantics).  Bit-identical
to the XLA backend (tests/test_colfc.py).

Layout transforms at the boundary are O(B * width) int8 reshapes /
transposes: [B, K0] -> [K0, B] on entry, [N_out, B] -> [B, N_out] on
exit -- at sine's K0 = N_out = 1 they are pure reshapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..compiler.ir import FullyConnectedLayer, Graph
from .flatpack import LANE, _clip_bounds

MAX_WIDTH = 32  # feature widths beyond this belong on the MXU


def plan_col(graph: Graph, max_width: int = MAX_WIDTH):
    """The column plan: every layer a FullyConnected with w_zp == 0 and
    both dims <= max_width.  Returns [(W_T i32 [N,K], d [N,1] i32,
    bias0 [N,1] f32, c1 [N,1] f32, clip_lo, clip_hi)] or None."""
    if np.dtype(graph.input_dtype) != np.int8:
        return None
    k0 = int(np.prod(graph.input_shape))
    if k0 > max_width:
        return None
    plan = []
    k_in = k0
    for layer in graph.layers:
        if not isinstance(layer, FullyConnectedLayer):
            return None
        if np.any(np.atleast_1d(layer.w_q.zero_point) != 0):
            return None
        k, n = layer.weights.shape
        if k != k_in or n > max_width or k > max_width:
            return None
        w = layer.weights.astype(np.int64)
        d = (-np.int64(layer.in_q.zp0) * w.sum(axis=0)).astype(np.int64)
        if np.any(d != d.astype(np.int32)):
            return None
        bias0 = (np.float32(layer.out_q.zp0)
                 + layer.c0.astype(np.float32)).reshape(n, 1)
        c1 = np.full((n, 1), np.float32(layer.c1), np.float32) \
            if np.ndim(layer.c1) == 0 else \
            np.asarray(layer.c1, np.float32).reshape(n, 1)
        lo, hi = _clip_bounds(layer.activation, float(layer.out_q.scale0),
                              layer.out_q.zp0)
        plan.append((layer.weights.T.astype(np.int32),  # [N, K]
                     d.astype(np.int32).reshape(n, 1),
                     bias0.astype(np.float32), c1.astype(np.float32),
                     lo, hi))
        k_in = n
    return plan if len(plan) >= 1 else None


def build_col_kernel(graph: Graph, tb: int = 32, interpret: bool = False,
                     max_width: int = MAX_WIDTH, compute: str = "i32"):
    """Compile the column kernel.  Returns (col_fn, meta) or None;
    ``col_fn(xq [B, K0] int8) -> int8 [B, N_out]`` requires
    B % (tb * 128) == 0 (the builder pads).

    ``compute``:

    * ``"i32"`` (default) -- the literal integer accumulation.
      Measured FASTER than the f32 form on v5e (0.64 vs 0.92 ns/sample
      at tb=32, scripts/ab_colfc.py round 5): Mosaic's i32
      multiply-add costs less than the per-layer int8->f32 converts
      the FMA form needs.
    * ``"f32"`` -- the MACs as f32 FMAs.  Still EXACT (every int8 x
      int8 product is <= 2**14 and the K <= 32 accumulation plus the d
      seed stays < 2**24, inside f32's integer-exact window; enforced
      by a planning-time bound that falls back to i32) -- kept as the
      measured-rejected alternative."""
    plan = plan_col(graph, max_width)
    if plan is None:
        return None
    if compute not in ("f32", "i32"):
        raise ValueError(f"compute {compute!r}")
    if compute == "f32":
        # integer-exactness bound: every partial sum (incl. the d seed)
        # must stay strictly inside f32's 2**24 exact-integer window
        for wt, d, _b0, _c1, _lo, _hi in plan:
            worst = 127 * int(np.abs(wt.astype(np.int64)).sum(axis=1).max()) \
                + int(np.abs(d.astype(np.int64)).max())
            if worst >= 2**24:
                compute = "i32"
                break
    k0 = int(np.prod(graph.input_shape))
    n_out = plan[-1][0].shape[0]
    L = tb * LANE

    consts = []
    idx = []
    for wt, d, b0, c1, lo, hi in plan:
        consts.append(jnp.asarray(wt))
        consts.append(jnp.asarray(d))
        consts.append(jnp.asarray(b0))
        consts.append(jnp.asarray(c1))
        idx.append(len(consts) - 4)

    acc_t = jnp.float32 if compute == "f32" else jnp.int32

    def kernel(x_ref, *refs):
        crefs = refs[:-1]
        out_ref = refs[-1]
        x = x_ref[:].astype(acc_t)  # [K0, L]
        for li, (wt, _d, _b0, _c1, lo, hi) in enumerate(plan):
            wref = crefs[idx[li]]
            dref = crefs[idx[li] + 1]
            bref = crefs[idx[li] + 2]
            cref = crefs[idx[li] + 3]
            n, k = wt.shape
            # start from d: in f32 mode every step is then one FMA
            acc = jnp.broadcast_to(dref[:].astype(acc_t), (n, x.shape[1]))
            for kk in range(k):
                acc = acc + x[kk : kk + 1, :] * wref[:, kk : kk + 1].astype(acc_t)
            y = bref[:] + cref[:] * acc.astype(jnp.float32)
            t = y + jnp.where(y >= 0, np.float32(0.5), np.float32(-0.5))
            if lo > -128.0 or hi < 127.0:
                t = jnp.clip(t, lo, hi)
            x8 = t.astype(jnp.int8)
            if li == len(plan) - 1:
                out_ref[:] = x8
            else:
                x = x8.astype(acc_t)

    def col_fn(xt):
        """xt: [K0, B] int8 (feature-major), B % (tb*128) == 0."""
        b = xt.shape[1]
        if b % L:
            raise ValueError(f"batch {b} not divisible by column tile {L}")
        in_specs = [pl.BlockSpec((k0, L), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)]
        for carr in consts:
            in_specs.append(pl.BlockSpec(carr.shape, lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
        return pl.pallas_call(
            kernel,
            grid=(b // L,),
            out_shape=jax.ShapeDtypeStruct((n_out, b), jnp.int8),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((n_out, L), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
            interpret=interpret,
        )(xt, *consts)

    meta = dict(k0=k0, n_out=n_out, tile=L)
    return col_fn, meta
