"""uint8 tensor path (the reference's ``Quantized`` trait covers i8 AND
u8, e.g. uint8-era models; ``src/quantize.rs:7-8``).  The op kernels must
produce exact integer results for uint8 activations/weights too."""

import jax.numpy as jnp
import numpy as np

from microflow_tpu.core import FusedActivation, ViewGeometry, ViewPadding, quantize, dequantize
from microflow_tpu.ops import conv_2d, depthwise_conv_2d, fully_connected


def test_quantize_uint8_saturates():
    assert int(quantize(jnp.float32(1e9), 0.2, 3, dtype=jnp.uint8)) == 255
    assert int(quantize(jnp.float32(-1e9), 0.2, 3, dtype=jnp.uint8)) == 0
    assert int(quantize(jnp.float32(1.0), 0.2, 3, dtype=jnp.uint8)) == 8
    assert float(dequantize(jnp.asarray(8, jnp.uint8), 0.2, 3)) == 1.0


def _fc_reference(x, w, w_zp, in_zp, bias0, c1, out_scale, out_zp, lo, hi):
    """Independent integer-exact recomputation in int64 numpy."""
    xc = x.astype(np.int64) - in_zp
    wc = w.astype(np.int64) - w_zp
    q = xc @ wc
    y = np.round(bias0 + c1 * q.astype(np.float32)).astype(np.int64)  # ties rare
    return np.clip(y, lo, hi)


def test_fully_connected_uint8():
    rng = np.random.default_rng(5)
    x = rng.integers(0, 256, (3, 16), dtype=np.uint8)
    w = rng.integers(0, 256, (16, 4), dtype=np.uint8)
    in_zp, w_zp = 128, 120
    bias0 = np.full(4, 7.0, np.float32)
    c1 = np.float32(0.001)
    c2 = (w.astype(np.int64).sum(0) * in_zp).astype(np.int32)
    c3 = 16 * in_zp * w_zp
    out = fully_connected(
        jnp.asarray(x), jnp.asarray(w),
        w_zp=w_zp, bias0=bias0, c1=c1, c2=c2, c3=c3,
        out_scale=0.05, out_zp=7, activation=FusedActivation.NONE,
    )
    want = _fc_reference(x, w, w_zp, in_zp, bias0, c1, 0.05, 7, 0, 255)
    assert out.dtype == jnp.uint8
    assert np.array_equal(np.asarray(out, np.int64), want)


def test_conv_2d_uint8():
    rng = np.random.default_rng(9)
    x = rng.integers(0, 256, (2, 5, 5, 3), dtype=np.uint8)
    filters = rng.integers(0, 256, (4, 3, 3, 3), dtype=np.uint8)
    in_zp = 100
    w_zp = np.full(4, 90, np.int32)
    geom = ViewGeometry(
        in_rows=5, in_cols=5, k_rows=3, k_cols=3,
        out_rows=5, out_cols=5, stride_rows=1, stride_cols=1,
        padding=ViewPadding.SAME,
    )
    bias0 = np.linspace(-3, 3, 4).astype(np.float32)
    c1 = np.full(4, 0.0005, np.float32)
    out = conv_2d(
        jnp.asarray(x), jnp.asarray(filters),
        geom=geom, in_zp=in_zp, w_zp=w_zp, bias0=bias0, c1=c1,
        out_scale=0.1, out_zp=0, activation=FusedActivation.RELU,
    )
    assert out.dtype == jnp.uint8
    # independent recompute via zp-padded windows in int64
    xp = np.full((2, 7, 7, 3), in_zp, np.int64)
    xp[:, 1:6, 1:6, :] = x
    want = np.zeros((2, 5, 5, 4), np.int64)
    for i in range(5):
        for j in range(5):
            win = xp[:, i : i + 3, j : j + 3, :] - in_zp
            wc = filters.astype(np.int64) - 90
            q = np.einsum("bmnc,fmnc->bf", win, wc)
            y = np.round(bias0 + c1 * q.astype(np.float32))
            want[:, i, j, :] = np.clip(y, 0, 255)
    want = np.maximum(want, 0)  # relu at zp=0
    assert np.array_equal(np.asarray(out, np.int64), want)


def test_depthwise_uint8_channel_fallback():
    rng = np.random.default_rng(13)
    x = rng.integers(0, 256, (1, 4, 4, 1), dtype=np.uint8)
    weights = rng.integers(0, 256, (3, 3, 2), dtype=np.uint8)
    geom = ViewGeometry(
        in_rows=4, in_cols=4, k_rows=3, k_cols=3,
        out_rows=4, out_cols=4, stride_rows=1, stride_cols=1,
        padding=ViewPadding.SAME,
    )
    out = depthwise_conv_2d(
        jnp.asarray(x), jnp.asarray(weights),
        geom=geom, in_zp=128, w_zp=np.array([128, 128], np.int32),
        bias0=np.zeros(2, np.float32), c1=np.full(2, 0.002, np.float32),
        out_scale=0.1, out_zp=128, activation=FusedActivation.NONE,
    )
    assert out.dtype == jnp.uint8
    assert out.shape == (1, 4, 4, 2)


def test_uint8_model_end_to_end(tmp_path):
    """A full uint8 model (u8 activations AND weights) through parse ->
    fold -> build -> predict; probabilities must be sane and the output
    dtype u8 throughout the quantized pipeline."""
    from microflow_tpu.compiler.builder import build
    from microflow_tpu.frontend import parser
    from microflow_tpu.models import synth

    path = str(tmp_path / "u8.tflite")
    synth.write(path, synth.uint8_mlp())
    g = parser.parse(path, name="u8")
    assert np.dtype(g.input_dtype) == np.uint8
    m = build(g)
    x = np.random.default_rng(3).uniform(-1, 1, (6, 16)).astype(np.float32)
    xq = np.asarray(m.quantize_input(x))
    assert xq.dtype == np.uint8
    yq = np.asarray(m.predict_inner(xq))
    assert yq.dtype == np.uint8
    probs = np.asarray(m.predict(x))
    assert probs.shape == (6, 4)
    assert (probs >= 0).all()
    assert np.allclose(probs.sum(axis=1), 1.0, atol=0.05)
