#!/usr/bin/env python
"""Probe Mosaic's f32 -> int8/int32 convert semantics on TPU.

The exact-requant trunc trick (round_away(y) = trunc(y + copysign(.5, y)))
is only valid if astype truncates toward zero (XLA C-style convert) and
saturates out-of-range.  Prints the observed semantics.
"""

import os
import sys

sys.path.insert(0, os.path.normpath(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

vals = np.array([[-2.7, -2.5, -2.3, -0.5, -0.49, 0.49, 0.5, 2.3, 2.5, 2.7,
                  127.6, 128.4, 200.0, -128.6, -200.0, 1e9]] * 8,
                np.float32)
vals = np.pad(vals, ((0, 0), (0, 128 - vals.shape[1])))


def k8(x_ref, o_ref):
    o_ref[...] = x_ref[...].astype(jnp.int8)


def k32(x_ref, o_ref):
    o_ref[...] = x_ref[...].astype(jnp.int32)


x = jnp.asarray(vals)
y8 = np.asarray(pl.pallas_call(
    k8, out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int8))(x))[0, :16]
y32 = np.asarray(pl.pallas_call(
    k32, out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int32))(x))[0, :16]
print("inputs :", vals[0, :16].tolist())
print("int8   :", y8.tolist())
print("int32  :", y32.tolist())
xla8 = np.asarray(jnp.asarray(vals).astype(jnp.int8))[0, :16]
print("xla i8 :", xla8.tolist())
trunc = np.trunc(vals[0, :16])
print("trunc? :", np.array_equal(y32[:10], trunc[:10].astype(np.int64).astype(np.int32)),
      "sat8?:", y8[12] == 127 and y8[14] == -128)
