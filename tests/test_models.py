"""End-to-end golden parity tests against the Rust reference engine
(``tests/sine.rs``, ``tests/speech.rs``, ``tests/person_detect.rs`` --
values recorded in BASELINE.md).  Outputs must match bit-for-bit.
"""

import os

import numpy as np
import pytest

from microflow_tpu import compile_tflite

MODELS = os.path.join(os.path.dirname(__file__), "..", "models")


@pytest.fixture(scope="module")
def sine():
    return compile_tflite(os.path.join(MODELS, "sine.tflite"), name="sine")


@pytest.fixture(scope="module")
def speech():
    return compile_tflite(os.path.join(MODELS, "speech.tflite"), name="speech")


@pytest.fixture(scope="module")
def person_detect():
    return compile_tflite(os.path.join(MODELS, "person_detect.tflite"), name="person_detect")


def test_sine_golden(sine):
    out = np.asarray(sine.predict(np.array([[0.5]], np.float32)))
    assert out.shape == (1, 1)
    assert out[0, 0] == np.float32(0.41348344)


def test_speech_golden(speech):
    out = np.asarray(speech.predict(np.full((1, 1960), 0.5, np.float32)))
    expected = np.array([[0.15625, 0.2734375, 0.2734375, 0.296875]], np.float32)
    assert np.array_equal(out, expected)


def test_person_detect_golden(person_detect):
    out = np.asarray(person_detect.predict(np.full((1, 96, 96, 1), 0.5, np.float32)))
    expected = np.array([[0.8046875, 0.1953125]], np.float32)
    assert np.array_equal(out, expected)


def test_sine_batched_consistency(sine):
    """Batching is the new capability: per-sample results must be identical
    to batch=1 runs."""
    xs = np.linspace(0.0, 2 * np.pi, 32, dtype=np.float32).reshape(-1, 1)
    batched = np.asarray(sine.predict(xs))
    singles = np.concatenate([np.asarray(sine.predict(xs[i : i + 1])) for i in range(len(xs))])
    assert np.array_equal(batched, singles)


def test_person_detect_batched_consistency(person_detect):
    rng = np.random.default_rng(42)
    xs = rng.uniform(0.0, 1.0, (4, 96, 96, 1)).astype(np.float32)
    batched = np.asarray(person_detect.predict(xs))
    singles = np.concatenate(
        [np.asarray(person_detect.predict(xs[i : i + 1])) for i in range(len(xs))]
    )
    assert np.array_equal(batched, singles)


def test_predict_quantized_path(sine):
    """predict_quantized skips input quantization (reference
    ``lib.rs:168-171``)."""
    xq = sine.quantize_input(np.array([[0.5]], np.float32))
    out = np.asarray(sine.predict_quantized(xq))
    assert out[0, 0] == np.float32(0.41348344)


def test_predict_inner_quantized_output(speech):
    xq = speech.quantize_input(np.full((1, 1960), 0.5, np.float32))
    yq = np.asarray(speech.predict_inner(xq))
    assert yq.dtype == np.int8
    # dequantize(yq) must equal the golden: (q + 128) / 256
    expected_q = np.array([[-88, -58, -58, -52]])  # 0.15625*256-128 etc.
    assert np.array_equal(yq, expected_q)


def test_expansion_dump(sine):
    txt = sine.expansion()
    assert "dot" in txt or "dot_general" in txt
