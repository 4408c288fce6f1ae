"""Pallas-kernel parity: the fused TPU kernels must match the pure-JAX
exact ops bit-for-bit.  On CPU the kernels run in Pallas interpreter mode
(enabled automatically off-TPU)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from microflow_tpu import compile_tflite
from microflow_tpu.core import FusedActivation, ViewGeometry, ViewPadding
from microflow_tpu.kernels import qdwconv, qgemm
from microflow_tpu.ops import depthwise_conv_2d, fully_connected

MODELS = os.path.join(os.path.dirname(__file__), "..", "models")


def test_qgemm_matches_fully_connected():
    rng = np.random.default_rng(7)
    M, K, N = 5, 37, 11
    x = jnp.asarray(rng.integers(-128, 128, (M, K), dtype=np.int8))
    w = jnp.asarray(rng.integers(-128, 128, (K, N), dtype=np.int8))
    w_zp, in_zp = 3, -7
    c0 = rng.normal(size=N).astype(np.float32)
    c1 = np.float32(0.0043)
    c2 = (np.asarray(w, np.int64).sum(0) * in_zp).astype(np.int32)
    c3 = K * in_zp * w_zp
    kwargs = dict(out_scale=0.05, out_zp=4, activation=FusedActivation.RELU6)
    ref = fully_connected(
        x, w, w_zp=w_zp, bias0=np.float32(4) + c0, c1=c1, c2=c2, c3=c3, **kwargs
    )
    got = qgemm(
        x,
        w,
        jnp.full((N,), w_zp, jnp.int32),
        jnp.int32(c3) - jnp.asarray(c2),
        jnp.asarray(np.float32(4) + c0),
        jnp.full((N,), c1, jnp.float32),
        **kwargs,
    )
    assert np.array_equal(np.asarray(ref), np.asarray(got))


@pytest.mark.parametrize("stride", [1, 2])
def test_qdwconv_matches_depthwise(stride):
    rng = np.random.default_rng(11)
    B, H, W, CH = 3, 9, 9, 4
    kh = kw = 3
    oh = ow = -(-H // stride) if stride > 1 else H
    x = jnp.asarray(rng.integers(-128, 128, (B, H, W, CH), dtype=np.int8))
    weights = jnp.asarray(rng.integers(-128, 128, (kh, kw, CH), dtype=np.int8))
    in_zp = -2
    w_zp = np.array([1, -3, 0, 5], np.int32)
    c0 = rng.normal(size=CH).astype(np.float32)
    c1 = rng.uniform(0.001, 0.01, CH).astype(np.float32)
    geom = ViewGeometry(
        in_rows=H, in_cols=W, k_rows=kh, k_cols=kw,
        out_rows=oh, out_cols=ow, stride_rows=stride, stride_cols=stride,
        padding=ViewPadding.SAME,
    )
    kwargs = dict(out_scale=0.07, out_zp=-1, activation=FusedActivation.RELU)
    ref = depthwise_conv_2d(
        x, weights, geom=geom, in_zp=in_zp, w_zp=w_zp,
        bias0=np.float32(-1) + c0, c1=c1, **kwargs,
    )
    top, bottom, left, right = geom.pad_amounts()
    xp = jnp.pad(
        x, ((0, 0), (top, bottom), (left, right), (0, 0)),
        constant_values=np.int8(in_zp),
    )
    wc = weights.astype(jnp.int32) - jnp.asarray(w_zp)[None, None, :]
    d = -jnp.int32(in_zp) * jnp.sum(wc, axis=(0, 1))
    got = qdwconv(
        xp, wc, d, jnp.asarray(np.float32(-1) + c0), jnp.asarray(c1),
        kh=kh, kw=kw, sr=stride, sc=stride, oh=oh, ow=ow, **kwargs,
    )
    assert np.array_equal(np.asarray(ref), np.asarray(got))


@pytest.mark.parametrize("model,make_input,expected", [
    ("sine", lambda: np.array([[0.5]], np.float32), [[0.41348344]]),
    ("speech", lambda: np.full((1, 1960), 0.5, np.float32),
     [[0.15625, 0.2734375, 0.2734375, 0.296875]]),
])
def test_pallas_backend_model_golden(model, make_input, expected):
    m = compile_tflite(os.path.join(MODELS, f"{model}.tflite"), backend="pallas")
    out = np.asarray(m.predict(make_input()))
    assert np.array_equal(out, np.array(expected, np.float32))


@pytest.mark.slow
def test_pallas_backend_person_detect_golden():
    m = compile_tflite(os.path.join(MODELS, "person_detect.tflite"), backend="pallas")
    out = np.asarray(m.predict(np.full((1, 96, 96, 1), 0.5, np.float32)))
    assert np.array_equal(out, np.array([[0.8046875, 0.1953125]], np.float32))


experimental = pytest.mark.skipif(
    not os.environ.get("MFT_TEST_EXPERIMENTAL"),
    reason="fused backend is experimental (measured loser, kept as a design "
    "witness -- docs/PERFORMANCE.md); set MFT_TEST_EXPERIMENTAL=1",
)


@experimental
@pytest.mark.parametrize("model,make_input,expected", [
    ("sine", lambda: np.array([[0.5]], np.float32), [[0.41348344]]),
    ("speech", lambda: np.full((2, 1960), 0.5, np.float32),
     [[0.15625, 0.2734375, 0.2734375, 0.296875]] * 2),
])
def test_fused_megakernel_model_golden(model, make_input, expected):
    """Whole-model megakernel backend (kernels/megakernel.py) parity."""
    m = compile_tflite(os.path.join(MODELS, f"{model}.tflite"), backend="fused")
    out = np.asarray(m.predict(make_input()))
    assert np.array_equal(out, np.array(expected, np.float32))


@experimental
@pytest.mark.slow
def test_fused_megakernel_person_detect_golden():
    m = compile_tflite(os.path.join(MODELS, "person_detect.tflite"), backend="fused")
    out = np.asarray(m.predict(np.full((3, 96, 96, 1), 0.5, np.float32)))
    assert np.array_equal(out, np.tile([[0.8046875, 0.1953125]], (3, 1)).astype(np.float32))
