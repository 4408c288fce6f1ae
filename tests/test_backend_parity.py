"""Cross-backend bit-parity on random inputs.

The engine's exactness contract is stronger than three golden vectors:
for ANY input, the supported backends (xla, pallas, flat) must agree
bit-for-bit (they implement the same integer algebra several ways).  The
Rust reference is not runnable here, but xla is golden-anchored to it
(test_models.py), so agreement transitively extends the anchor.

The experimental backends (fused/hybrid/packed -- measured losers kept
as design witnesses, docs/PERFORMANCE.md) are parity-gated behind
MFT_TEST_EXPERIMENTAL=1 and excluded from the supported matrix.
"""

import os

import numpy as np
import pytest

from microflow_tpu import compile_tflite

MODELS = os.path.join(os.path.dirname(__file__), "..", "models")


def _rand_input(shape, rng):
    return rng.uniform(-1.5, 1.5, shape).astype(np.float32)


experimental = pytest.mark.skipif(
    not os.environ.get("MFT_TEST_EXPERIMENTAL"),
    reason="fused/hybrid backends are experimental (measured losers, kept as "
    "design witnesses -- docs/PERFORMANCE.md); set MFT_TEST_EXPERIMENTAL=1",
)


@pytest.mark.parametrize(
    "backend",
    ["pallas",
     pytest.param("fused", marks=experimental),
     pytest.param("hybrid", marks=experimental)],
)
@pytest.mark.parametrize(
    "model,shape",
    [("sine", (7, 1)), ("speech", (3, 1960))],
)
def test_backend_parity_random(model, shape, backend, rng=np.random.default_rng(42)):
    path = os.path.join(MODELS, f"{model}.tflite")
    ref = compile_tflite(path, backend="xla")
    alt = compile_tflite(path, backend=backend)
    x = _rand_input(shape, rng)
    a = np.asarray(ref.predict(x))
    b = np.asarray(alt.predict(x))
    assert np.array_equal(a, b), f"{model}/{backend}: max|d|={np.abs(a - b).max()}"


@pytest.mark.slow
@pytest.mark.parametrize(
    "backend",
    ["pallas", pytest.param("fused", marks=experimental)],
)
def test_backend_parity_person_detect(backend):
    rng = np.random.default_rng(7)
    path = os.path.join(MODELS, "person_detect.tflite")
    ref = compile_tflite(path, backend="xla")
    alt = compile_tflite(path, backend=backend)
    x = rng.uniform(0.0, 1.0, (2, 96, 96, 1)).astype(np.float32)
    a = np.asarray(ref.predict(x))
    b = np.asarray(alt.predict(x))
    assert np.array_equal(a, b), f"person/{backend}: max|d|={np.abs(a - b).max()}"


def test_quantized_entry_parity():
    """predict_quantized / predict_inner agree across backends on raw
    int8 inputs covering the full range."""
    path = os.path.join(MODELS, "sine.tflite")
    ref = compile_tflite(path, backend="xla")
    alt = compile_tflite(path, backend="pallas")
    xq = np.arange(-128, 128, dtype=np.int8).reshape(-1, 1)
    assert np.array_equal(
        np.asarray(ref.predict_inner(xq)), np.asarray(alt.predict_inner(xq))
    )
