"""Static window/padding geometry and patch extraction.

TPU-native replacement for the reference's per-pixel ``Tensor4D::view``
extraction (``src/tensor.rs:180-228``).  Where the reference
re-materializes a KHxKW window per output pixel at run time, we lower every
windowed op to *static* patch extraction + one big contraction, which is
the shape XLA/MXU wants.

SAME-padding semantics replicate the reference exactly: the window shift is
``((K-1)/2, (K-1)/2)`` (floor), NOT TensorFlow's balanced padding -- for
stride-2 3x3 convs these differ (reference pads top/left, TF pads
bottom/right).  Out-of-bounds elements are zero-filled and tracked by a
validity count ``len`` (reference ``TensorView.mask``/``len``).

The key numeric identity used by the conv kernels: the reference's four
dynamic SAME-padding correction terms (``src/ops/conv_2d.rs:100-127``)
collapse algebraically to

    sum_over_valid (in - in_zp) * (w - w_zp)

which equals a *full-window* sum if the input is padded with the value
``in_zp`` (padded positions contribute ``(in_zp - in_zp) * (w - w_zp) = 0``
exactly, in integer arithmetic).  So padding with the input zero-point makes
every per-pixel correction constant vanish -- no mask planes needed in the
forward pass.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


class ViewPadding(enum.Enum):
    """Reference ``TensorViewPadding`` (``src/tensor.rs:8-15``)."""

    SAME = "same"
    VALID = "valid"


def same_shift(k: int) -> int:
    """Reference shift ``(K - 1) / 2`` (``src/tensor.rs:193``)."""
    return (k - 1) // 2


@dataclass(frozen=True)
class ViewGeometry:
    """Static geometry of a windowed op (conv / dwconv / avgpool)."""

    in_rows: int
    in_cols: int
    k_rows: int
    k_cols: int
    out_rows: int
    out_cols: int
    stride_rows: int
    stride_cols: int
    padding: ViewPadding

    def pad_amounts(self) -> tuple[int, int, int, int]:
        """(top, bottom, left, right) zero-padding so that every window of
        every output pixel is in bounds of the padded array."""
        if self.padding is ViewPadding.VALID:
            return (0, 0, 0, 0)
        top = same_shift(self.k_rows)
        left = same_shift(self.k_cols)
        bottom = max(
            0, self.stride_rows * (self.out_rows - 1) + self.k_rows - 1 - top - (self.in_rows - 1)
        )
        right = max(
            0, self.stride_cols * (self.out_cols - 1) + self.k_cols - 1 - left - (self.in_cols - 1)
        )
        return (top, bottom, left, right)

    def origin(self, i: int, j: int) -> tuple[int, int]:
        """Top-left input coordinate of window (i, j) -- may be negative
        for SAME padding (reference ``get_input_index``,
        ``src/update_layer.rs:347-364``)."""
        if self.padding is ViewPadding.SAME:
            return (
                self.stride_rows * i - same_shift(self.k_rows),
                self.stride_cols * j - same_shift(self.k_cols),
            )
        return (self.stride_rows * i, self.stride_cols * j)

    def valid_mask_plane(self) -> np.ndarray:
        """Boolean [out_rows, out_cols, k_rows, k_cols]: which window
        positions are in bounds (reference ``TensorView.mask``)."""
        mask = np.zeros((self.out_rows, self.out_cols, self.k_rows, self.k_cols), dtype=bool)
        for i in range(self.out_rows):
            for j in range(self.out_cols):
                r0, c0 = self.origin(i, j)
                for m in range(self.k_rows):
                    for n in range(self.k_cols):
                        r, c = r0 + m, c0 + n
                        mask[i, j, m, n] = 0 <= r < self.in_rows and 0 <= c < self.in_cols
        return mask

    def len_plane(self) -> np.ndarray:
        """int32 [out_rows, out_cols]: count of in-bounds window positions
        (reference ``TensorView.len``)."""
        return self.valid_mask_plane().sum(axis=(2, 3)).astype(np.int32)


def extract_patches(x: jax.Array, geom: ViewGeometry, pad_value: int) -> jax.Array:
    """[B, H, W, C] -> [B, OH, OW, KH, KW, C] patches via static slicing.

    ``pad_value`` is ``in_zp`` for convs (see module docstring) and 0 for
    average pooling (the reference zero-fills views,
    ``src/tensor.rs:202``).
    """
    top, bottom, left, right = geom.pad_amounts()
    xp = jnp.pad(
        x,
        ((0, 0), (top, bottom), (left, right), (0, 0)),
        constant_values=np.asarray(pad_value, dtype=x.dtype),
    )
    rows = []
    for m in range(geom.k_rows):
        cols = []
        for n in range(geom.k_cols):
            sl = xp[
                :,
                m : m + geom.stride_rows * (geom.out_rows - 1) + 1 : geom.stride_rows,
                n : n + geom.stride_cols * (geom.out_cols - 1) + 1 : geom.stride_cols,
                :,
            ]
            cols.append(sl)
        rows.append(jnp.stack(cols, axis=3))  # [B, OH, OW, KW, C]
    return jnp.stack(rows, axis=3)  # [B, OH, OW, KH, KW, C]


def reshape_2d(x: jax.Array) -> jax.Array:
    """Tensor4D -> Tensor2D row-major NHWC flatten (reference ``From``
    impl, ``src/tensor.rs:95-115``)."""
    return jnp.reshape(x, (x.shape[0], -1))


def reshape_4d(x: jax.Array, rows: int, cols: int, chans: int) -> jax.Array:
    """Tensor2D -> Tensor4D row-major NHWC unflatten (reference ``From``
    impl, ``src/tensor.rs:117-141``)."""
    return jnp.reshape(x, (x.shape[0], rows, cols, chans))
