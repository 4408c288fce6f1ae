#!/usr/bin/env python
"""Probe: a pallas input BlockSpec may be WIDER than the array's lane
dim (e.g. block 2048 lanes over a [B, 1960] int8 array).

Findings on v5e (round 4):
* legal -- Mosaic DMAs the array's PHYSICAL (32,128)-padded tile, so a
  block up to ceil(lanes/128)*128 never leaves the allocation;
* the out-of-bounds lanes read ARBITRARY values (probe A: they are NOT
  zero-filled), so correctness requires every matrix row / tap plane
  referencing them to be zero -- which the flat planner guarantees by
  construction (taps only index real input lanes);
* with zero weights on OOB rows the dot is bit-exact (probe B).

Consequence: flat_fn skips the jnp.pad HBM round-trip when in_off == 0
(kernels/flatpack.py) -- on speech that pad was ~4.9 ns/sample of pure
HBM copy, ~11% of the kernel's runtime (docs/PERFORMANCE.md round 4).
"""

import os
import sys

sys.path.insert(0, os.path.normpath(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TB, IN, INP = 256, 1960, 2048
x = jnp.ones((TB, IN), jnp.int8)


def run(mat):
    def kernel(x_ref, m_ref, o_ref):
        win = x_ref[:, 1920:2048]  # crosses the logical 1960 boundary
        o_ref[:, :] = lax.dot_general(win, m_ref[:], (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)

    return np.asarray(pl.pallas_call(
        kernel,
        grid=(1,),
        out_shape=jax.ShapeDtypeStruct((TB, 128), jnp.int32),
        in_specs=[pl.BlockSpec((TB, INP), lambda i: (i, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((128, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TB, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(x, jnp.asarray(mat)))


mat_a = np.zeros((128, 128), np.int8)
mat_a[:80, :] = 1  # weights over lanes 1920..1999 incl. 40 OOB lanes
print("probe A (nonzero weights over OOB lanes):", np.unique(run(mat_a)),
      "-- 80 here means OOB lanes read NONZERO garbage; zero weights required")
mat_b = np.zeros((128, 128), np.int8)
mat_b[:40, :] = 1  # only in-bounds lanes 1920..1959
got = np.unique(run(mat_b))
print("probe B (zero weights over OOB lanes):", got, "want [40]")
assert got.tolist() == [40]
