"""Fixed-point requant (multiplier + right-shift) vs the exact f32 recipe.

SURVEY.md §7(d): derive the fixed-point requant form and prove <=1 LSB
against the reference-exact float path, per model, on random inputs.
"""

import os

import jax
import numpy as np
import pytest

from microflow_tpu import compile_tflite
from microflow_tpu.compiler.fixed_forward import build_fixed_forward
from microflow_tpu.core.fixedpoint import quantize_multiplier

MODELS = os.path.join(os.path.dirname(__file__), "..", "models")


def test_quantize_multiplier_reconstructs():
    for c1 in (0.5, 0.004311, 1.7e-3, 0.9999, 123.4, 1e-8):
        m, s = quantize_multiplier(c1)
        assert abs(m / 2.0**s - c1) <= c1 * 2.0 ** -14, c1
    assert quantize_multiplier(0.0) == (0, 0)


@pytest.mark.parametrize(
    "name,shape",
    [("sine", (64, 1)), ("speech", (4, 1960)), ("person_detect", (2, 96, 96, 1))],
)
def test_fixed_requant_within_1_lsb(name, shape):
    model = compile_tflite(os.path.join(MODELS, f"{name}.tflite"), name=name)
    fixed = jax.jit(build_fixed_forward(model.graph))
    rng = np.random.default_rng(5)
    xq = rng.integers(-128, 128, shape, dtype=np.int8)
    ref = np.asarray(model.predict_inner(xq)).astype(np.int32)
    got = np.asarray(fixed(model.params, xq)).astype(np.int32)
    worst = int(np.abs(ref - got).max())
    assert worst <= 1, f"{name}: {worst} LSB deviation"
