"""Packed-pipeline kernel (kernels/packed.py) bit-parity vs the XLA path.

The packed backend runs the maximal dw/pw prefix of person_detect in one
WC-packed guard-row Pallas kernel (reference hot loops
``src/ops/depthwise_conv_2d.rs:100-109``, ``conv_2d.rs:92-99``); its
contract is bit-identical int8 activations at every boundary, so
full-model outputs must match XLA exactly on ANY input.
"""

import os

import numpy as np
import pytest

from microflow_tpu import compile_tflite
from microflow_tpu.frontend.parser import parse
from microflow_tpu.kernels.packed import plan_packed

MODELS = os.path.join(os.path.dirname(__file__), "..", "models")
PERSON = os.path.join(MODELS, "person_detect.tflite")


def test_plan_covers_prefix():
    graph = parse(PERSON)
    plan = plan_packed(graph)
    assert plan is not None
    _, n_layers, meta = plan
    # the whole C<64 hot prefix (VERDICT r1: L0..L10) and beyond
    assert n_layers >= 11
    assert meta["lanes_out"] % 128 == 0


def test_plan_rejects_non_conv_start():
    graph = parse(os.path.join(MODELS, "sine.tflite"))
    assert plan_packed(graph) is None


@pytest.mark.slow
@pytest.mark.skipif(
    not os.environ.get("MFT_TEST_EXPERIMENTAL"),
    reason="packed backend is experimental (superseded by flat; postmortem in "
    "docs/PERFORMANCE.md); set MFT_TEST_EXPERIMENTAL=1 to run its parity test",
)
def test_packed_parity_person_detect():
    rng = np.random.default_rng(11)
    ref = compile_tflite(PERSON, backend="xla")
    alt = compile_tflite(PERSON, backend="packed")
    # batch 3 exercises the tb-padding path (3 % tb != 0)
    x = rng.uniform(0.0, 1.0, (3, 96, 96, 1)).astype(np.float32)
    a = np.asarray(ref.predict(x))
    b = np.asarray(alt.predict(x))
    assert np.array_equal(a, b), f"packed: max|d|={np.abs(a - b).max()}"
    # raw int8 entry over the full input range
    xq = rng.integers(-128, 128, (5, 96, 96, 1), dtype=np.int8)
    aq = np.asarray(ref.predict_inner(xq))
    bq = np.asarray(alt.predict_inner(xq))
    assert np.array_equal(aq, bq)
