"""Affine quantization core (TPU-native equivalent of reference R2,
``src/quantize.rs``).

A quantized tensor is a plain JAX integer array plus static ``QParams``
(scale / zero-point, per-tensor or per-channel).  Unlike the reference --
which encodes scale/zero-point as runtime struct fields -- we keep them as
*static* Python/numpy values so they constant-fold into the XLA program,
exactly like the proc-macro bakes them into generated Rust code.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from .numerics import f32, round_away, saturating_cast


@dataclass(frozen=True)
class QParams:
    """Static quantization parameters (reference ``Tensor2D.scale`` /
    ``zero_point`` arrays, ``src/tensor.rs:27-47``).

    ``scale``/``zero_point`` have one entry for per-tensor quantization or
    C entries for per-channel (reference ``QUANTS`` const generic).
    """

    scale: tuple = field(default=(1.0,))
    zero_point: tuple = field(default=(0,))

    def __post_init__(self):
        object.__setattr__(self, "scale", tuple(np.float32(s) for s in np.atleast_1d(self.scale)))
        object.__setattr__(self, "zero_point", tuple(int(z) for z in np.atleast_1d(self.zero_point)))

    @property
    def num_quants(self) -> int:
        return len(self.scale)

    def scale_at(self, i: int) -> np.float32:
        """Reference ``scale.get(i).unwrap_or(scale[0])`` pattern."""
        return self.scale[i] if i < len(self.scale) else self.scale[0]

    def zero_point_at(self, i: int) -> int:
        return self.zero_point[i] if i < len(self.zero_point) else self.zero_point[0]


def quantize(x: jax.Array, scale, zero_point, dtype=jnp.int8) -> jax.Array:
    """``quantize(f) = roundf(f / scale + zp)`` with a saturating cast
    (reference ``src/quantize.rs:26-28``)."""
    y = round_away(f32(x) / jnp.float32(scale) + jnp.float32(zero_point))
    return saturating_cast(y, dtype)


def dequantize(q: jax.Array, scale, zero_point) -> jax.Array:
    """``dequantize(q) = scale * (q - zp)`` (reference
    ``src/quantize.rs:37-39``).  Note the reference multiplies
    ``scale * (f32(q) - f32(zp))`` -- we keep that exact association."""
    return jnp.float32(scale) * (f32(q) - jnp.float32(zero_point))
