"""Front-end tests: flatbuffer reader + tflite parsing + constant folding.

Folding goldens come from the reference macro-crate unit tests
(``microflow-macros/src/ops/fully_connected.rs:191-219``,
``conv_2d.rs:186-207``).
"""

import os

import numpy as np

from microflow_tpu.compiler import folding
from microflow_tpu.compiler.ir import QuantInfo
from microflow_tpu.frontend import load_model, parse
from microflow_tpu.frontend.tflite import BuiltinOperator

MODELS = os.path.join(os.path.dirname(__file__), "..", "models")


def q(scale, zp):
    return QuantInfo(np.asarray(scale, np.float32), np.asarray(zp, np.int64))


def test_fully_connected_preprocess_golden():
    # microflow-macros/src/ops/fully_connected.rs:191-219
    weights = np.array([[1, 2, 3], [4, 5, 6]], np.int8)  # [K=2, N=3]
    bias = np.array([19, 20, 21], np.int32)
    c0, c1, c2, c3 = folding.preprocess_fully_connected(
        in_q=q([0.17], [18]),
        w_q=q([0.7], [8]),
        bias=bias,
        bias_q=q([0.22], [23]),
        out_q=q([0.9], [10]),
        weights=weights,
    )
    assert np.array_equal(c0, np.array([-0.9777778, -0.73333335, -0.4888889], np.float32))
    assert c1 == np.float32(0.13222224)
    assert np.array_equal(c2, np.array([90, 126, 162], np.int32))
    assert c3 == 288


def test_conv_2d_preprocess_golden():
    # microflow-macros/src/ops/conv_2d.rs:186-207
    c0, c1 = folding.preprocess_conv_2d(
        in_q=q([0.35], [36]),
        w_q=q([0.25, 0.26], [27, 28]),
        bias=np.array([37, 38], np.int32),
        bias_q=q([0.39, 0.40], [41, 42]),
        out_q=q([0.29], [30]),
        num_filters=2,
    )
    assert np.array_equal(c0, np.array([-5.37931, -5.5172415], np.float32))
    assert np.array_equal(c1, np.array([0.30172414, 0.3137931], np.float32))


def test_average_pool_preprocess():
    # microflow-macros/src/ops/average_pool_2d.rs:134-145:
    # in scale 0.5 zp 6, out scale 0.1 zp 2 -> (5.0, -28.0)
    c0, c1 = folding.preprocess_average_pool_2d(q([0.5], [6]), q([0.1], [2]))
    assert c0 == np.float32(5.0)
    assert c1 == np.float32(-28.0)


def test_flatbuffer_model_structure():
    m = load_model(os.path.join(MODELS, "speech.tflite"))
    sg = m.subgraphs[0]
    codes = [BuiltinOperator(m.operator_codes[op.opcode_index].op) for op in sg.operators]
    assert codes == [
        BuiltinOperator.RESHAPE,
        BuiltinOperator.DEPTHWISE_CONV_2D,
        BuiltinOperator.FULLY_CONNECTED,
        BuiltinOperator.SOFTMAX,
    ]


def test_parse_person_detect_per_channel():
    g = parse(os.path.join(MODELS, "person_detect.tflite"))
    assert len(g.layers) == 31
    # layer 0: depthwise with per-channel quant (quantized_dimension=3)
    dw = g.layers[0]
    assert dw.weights.shape == (3, 3, 8)
    assert len(dw.w_q.scale) == 8
    assert len(dw.c1) == 8
    assert g.input_shape == (96, 96, 1)
    assert g.output_shape == (2,)


def test_parse_sine_weights_transposed():
    g = parse(os.path.join(MODELS, "sine.tflite"))
    fc0 = g.layers[0]
    assert fc0.weights.shape == (1, 16)  # tflite [16, 1] transposed
    assert fc0.c2.shape == (16,)


def test_parser_rejects_corrupt_files(tmp_path):
    """Parse failures abort with diagnostics (reference abort_call_site!,
    microflow-macros/src/lib.rs:50-58) -- never crash or mis-parse."""
    import pytest

    from microflow_tpu.frontend import parser

    bad = tmp_path / "bad.tflite"
    bad.write_bytes(b"\x00\x01\x02\x03NOPE" + b"\x00" * 64)
    with pytest.raises(Exception) as e:
        parser.parse(str(bad), frontend="python")
    assert "TFLite" in str(e.value) or "identifier" in str(e.value)

    truncated = tmp_path / "trunc.tflite"
    with open("models/sine.tflite", "rb") as f:
        data = f.read()
    truncated.write_bytes(data[: len(data) // 3])
    with pytest.raises(Exception):
        parser.parse(str(truncated), frontend="python")
