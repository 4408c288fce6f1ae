"""Core numerics/quantize/activation golden tests.

Golden values come from the reference's in-module unit tests
(``src/quantize.rs:41-63``, ``src/activation.rs:48-101``,
``src/tensor.rs:265-413``).
"""

import jax.numpy as jnp
import numpy as np

from microflow_tpu.core import (
    FusedActivation,
    ViewGeometry,
    ViewPadding,
    dequantize,
    quantize,
    relu,
    relu6,
    round_away,
)
from microflow_tpu.core.activation import quantize_scalar, softmax_elem


def test_quantize_value():
    # src/quantize.rs: quantize(1., 0.2, 3) == 8
    assert int(quantize(jnp.float32(1.0), 0.2, 3)) == 8


def test_dequantize_value():
    # src/quantize.rs: dequantize(8, 0.2, 3) == 1.
    assert float(dequantize(jnp.int8(8), 0.2, 3)) == 1.0


def test_round_away_semantics():
    x = jnp.array([0.5, 1.5, 2.5, -0.5, -1.5, -2.5, 0.49999997], jnp.float32)
    expected = [1.0, 2.0, 3.0, -1.0, -2.0, -3.0, 0.0]
    assert np.array_equal(np.asarray(round_away(x)), expected)


def test_quantize_saturates():
    # Rust `as` casts saturate (f32 -> i8)
    assert int(quantize(jnp.float32(1000.0), 0.2, 3)) == 127
    assert int(quantize(jnp.float32(-1000.0), 0.2, 3)) == -128


def test_relu():
    # src/activation.rs: zp = 2
    assert int(relu(jnp.int8(1), 2)) == 2
    assert int(relu(jnp.int8(3), 2)) == 3


def test_relu6_saturated():
    # src/activation.rs: relu6(63, 0.1, 2) == 62
    assert int(relu6(jnp.int8(63), 0.1, 2)) == 62
    assert quantize_scalar(6.0, 0.1, 2) == 62


def test_softmax_activation():
    # src/activation.rs softmax tests: scale=0.1 zp=2 sum=30.192875
    s = 30.192875
    out1 = softmax_elem(jnp.float32(1.0), jnp.float32(s), 0.1, 2, jnp.int8)
    assert int(out1) == 3
    total = sum(
        int(softmax_elem(jnp.float32(v), jnp.float32(s), 0.1, 2, jnp.int8)) for v in (1.0, 2.0, 3.0)
    )
    assert total == 16


def test_tensor_quantize_roundtrip_2d():
    # src/tensor.rs TENSOR_2D constants
    buf = jnp.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]], jnp.float32)
    q = quantize(buf, 0.7, 8)
    assert np.array_equal(np.asarray(q), [[9, 11, 12], [14, 15, 17]])
    d = dequantize(q, 0.7, 8)
    expected = np.array([[0.7, 2.1, 2.8], [4.2, 4.9, 6.2999997]], np.float32)
    assert np.array_equal(np.asarray(d), expected)


def test_view_geometry_same_len():
    # src/tensor.rs tensor_4d_view: 2x3 input, 2x3 view at focus (1,1),
    # SAME, stride 1 -> len == 3, second window row out of bounds
    geom = ViewGeometry(
        in_rows=2, in_cols=3, k_rows=2, k_cols=3,
        out_rows=2, out_cols=3, stride_rows=1, stride_cols=1,
        padding=ViewPadding.SAME,
    )
    lens = geom.len_plane()
    assert lens[1, 1] == 3
    mask = geom.valid_mask_plane()
    assert mask[1, 1].tolist() == [[True, True, True], [False, False, False]]
