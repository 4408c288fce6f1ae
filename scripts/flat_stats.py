#!/usr/bin/env python
"""Static MXU-slot cost model of the flat-kernel plan (no TPU needed).

For each planned layer, slots/sample = sum over dot groups of
K_total * N  (K_total = summed window heights, N = fused output lanes)
-- the MXU slot-products a [TB, K] x [K, N] int8 dot costs per sample.
The VPU requant cost is ~proportional to lanes_out.  Use this to
evaluate planner changes (grouping, phase offsets) before paying a TPU
compile.  Usage: flat_stats.py [model.tflite] [--group-n N] [--csv]
"""

import os
import sys

sys.path.insert(0, os.path.normpath(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")))

import numpy as np

from microflow_tpu.frontend.parser import parse
from microflow_tpu.kernels.flatpack import plan_flat

args = [a for a in sys.argv[1:] if not a.startswith("--")]
path = args[0] if args else "models/person_detect.tflite"
group_n = 512
for i, a in enumerate(sys.argv):
    if a == "--group-n":
        group_n = int(sys.argv[i + 1])

no_opt = "--baseline" in sys.argv

graph = parse(path)
plan = plan_flat(graph, group_n=group_n, use_offsets=not no_opt,
                 use_taps=not no_opt)
if plan is None:
    sys.exit(f"{path}: not flat-packable")
ops, n_layers, meta = plan

print(f"{path}: {n_layers} layers planned, group_n={group_n}"
      f"{' (baseline: no offsets/taps)' if no_opt else ''}")
print(f"{'L':>3} {'kind':<25} {'off':>8} {'lanes':>7} {'groups':>6} "
      f"{'mats':>5} {'Kavg':>6} {'slots/sample':>13} {'slots/lane':>10}")
tot_slots = tot_lanes = 0
for op in ops:
    layer = graph.layers[op.layer_idx]
    slots = op.slots()
    ksum = sum(sum(op.mats[cid].shape[0] for _, cid in parts)
               for _, parts in op.groups)
    kavg = ksum / max(1, len(op.groups))
    name = type(layer).__name__.replace("Layer", "")
    geom = getattr(layer, "geom", None)
    tag = (f"{name} {op.out_shape} s{geom.stride_rows}" if geom else name)
    if op.kind == "taps":
        tag = "VPU-" + tag
    offs = f"{op.in_off}->{op.out_off}"
    print(f"{op.layer_idx:>3} {tag:<25} {offs:>8} {op.lanes_out:>7} "
          f"{len(op.groups):>6} "
          f"{len(op.mats):>5} {kavg:>6.0f} {slots:>13,} {slots // op.lanes_out:>10}")
    tot_slots += slots
    tot_lanes += op.lanes_out
print(f"TOTAL slots/sample = {tot_slots:,}   requant lanes/sample = {tot_lanes:,}")
print(f"  @107 T-slots/s effective -> MXU {tot_slots / 107e12 * 1e9:.0f} ns/sample "
      f"({tot_slots / 107e12 * 6144 * 1e3:.2f} ms @6144)")
