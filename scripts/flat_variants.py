#!/usr/bin/env python
"""Kernel-only chained timing of flat-kernel planner variants (TPU).

Isolates the round-3 levers: phase offsets (MXU window alignment) and
VPU tap ops (dw off the MXU).  Times ONLY the pallas kernel (input
bump-chained, host readback barrier), full-model plan, per variant.
Usage: flat_variants.py [B] [ITERS] [tb] [variants...] [--model PATH]
  variants: ot (offsets+taps) o- (offsets only) -- (neither) -t (taps only)
  modifiers: ':requant' '@tb' '#depth' '%slack' '!group_n'
"""

import os
import sys
import time

sys.path.insert(0, os.path.normpath(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")))

import jax
import jax.numpy as jnp
import numpy as np

from microflow_tpu.frontend.parser import parse
from microflow_tpu.kernels.flatpack import build_flat_kernel

args = sys.argv[1:]
MODEL = "models/person_detect.tflite"
if "--model" in args:
    i = args.index("--model")
    MODEL = args[i + 1]
    del args[i : i + 2]
B = int(args[0]) if args else 6144
ITERS = int(args[1]) if len(args) > 1 else 50
TB = int(args[2]) if len(args) > 2 else 256
names = args[3:] or ["ot", "o-", "--"]

graph = parse(MODEL)
# variant key: offsets/taps pair, optionally ':<requant>' (exact, raw,
# fixed), '@<tb>' overriding the batch tile, '#<depth>' the software
# pipeline depth
VAR = {"ot": (True, True), "o-": (True, False),
       "--": (False, False), "-t": (False, True)}

for name in names:
    spec = name
    tb = TB
    requant = "exact"
    depth = 1
    slack = 1.05
    gn = 512
    if "%" in spec:
        spec, sl = spec.split("%")
        slack = float(sl)
    if "!" in spec:
        spec, g_s = spec.split("!")
        gn = int(g_s)
    if "#" in spec:
        spec, d_s = spec.split("#")
        depth = int(d_s)
    if "@" in spec:
        spec, tb_s = spec.split("@")
        tb = int(tb_s)
    if ":" in spec:
        spec, requant = spec.split(":")
    use_off, use_taps = VAR[spec]
    t0 = time.time()
    res = build_flat_kernel(graph, tb=tb, use_offsets=use_off,
                            use_taps=use_taps, requant=requant, depth=depth,
                            group_n=gn, fuse_slack=slack)
    if res is None:
        print(f"{name}: no plan")
        continue
    flat_fn, n_layers, meta = res
    plan_t = time.time() - t0

    @jax.jit
    def chain(x):
        y = flat_fn(x)
        bump = y[:, :1].astype(jnp.int8)
        return (x + bump).astype(jnp.int8), y

    xq = jax.device_put(jax.random.randint(
        jax.random.PRNGKey(0), (B, meta["in_lanes"]), -128, 128,
        dtype=jnp.int8))
    t0 = time.time()
    x, y = chain(xq)
    _ = int(np.asarray(y[0, 0]))  # device-sliced scalar barrier (CLAUDE.md)
    comp_t = time.time() - t0
    best = None
    for rep in range(3):
        t0 = time.time()
        for _ in range(ITERS):
            x, y = chain(x)
        _ = int(np.asarray(y[0, 0]))
        dt = (time.time() - t0) / ITERS * 1e3
        best = dt if best is None else min(best, dt)
    print(f"{name}: layers={n_layers} plan {plan_t:.1f}s compile {comp_t:.1f}s "
          f"-> {best:7.3f} ms/batch ({B/best*1e3:,.0f} inf/s)", flush=True)
