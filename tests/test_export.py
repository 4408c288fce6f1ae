"""Trained-model export (frontend/export.py): parse -> export -> parse
round trips bit-exactly for untrained models (incl. per-channel
person_detect), the official TFLite runtime loads the exported bytes,
and a trained model exports with bounded bias-quantization error."""

import os

import numpy as np
import pytest

from microflow_tpu import compile_tflite

MODELS = os.path.join(os.path.dirname(__file__), "..", "models")
rng = np.random.default_rng(3)


def _roundtrip(name, tmp_path):
    m = compile_tflite(os.path.join(MODELS, f"{name}.tflite"), name=name)
    path = str(tmp_path / f"{name}_rt.tflite")
    m.export(path)
    m2 = compile_tflite(path, name=f"{name}_rt")
    xq = rng.integers(-128, 128, (4, *m.graph.input_shape), dtype=np.int8)
    a = np.asarray(m.predict_inner(xq))
    b = np.asarray(m2.predict_inner(xq))
    np.testing.assert_array_equal(a, b)


def test_export_roundtrip_sine(tmp_path):
    _roundtrip("sine", tmp_path)


def test_export_roundtrip_speech(tmp_path):
    _roundtrip("speech", tmp_path)


def test_export_roundtrip_person_detect(tmp_path):
    # exercises per-channel dw (quantized_dimension=3), SAME stride-2
    # convs, avgpool, reshape-free FC head and softmax
    _roundtrip("person_detect", tmp_path)


def test_export_roundtrip_synth_full_ops(tmp_path):
    """QUANTIZE + dwconv + conv + SAME avgpool + reshape + fc + softmax."""
    from microflow_tpu.models import synth

    src = synth.write(str(tmp_path / "full_ops.tflite"), synth.full_ops())
    m = compile_tflite(src, name="full_ops")
    path = str(tmp_path / "full_ops_rt.tflite")
    m.export(path)
    m2 = compile_tflite(path, name="full_ops_rt")
    xq = rng.integers(-128, 128, (3, 8, 8, 2), dtype=np.int8)
    np.testing.assert_array_equal(
        np.asarray(m.predict_inner(xq)), np.asarray(m2.predict_inner(xq)))


def test_export_loads_in_official_tflite():
    try:
        from ai_edge_litert.interpreter import Interpreter
    except ImportError:
        tf = pytest.importorskip("tensorflow")
        Interpreter = tf.lite.Interpreter
    m = compile_tflite(os.path.join(MODELS, "sine.tflite"), name="sine")
    interp = Interpreter(model_content=m.export())
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    out = interp.get_output_details()[0]
    x = np.array([[0.5]], np.float32)
    xq = np.round(x / inp["quantization"][0] + inp["quantization"][1]).astype(np.int8)
    interp.set_tensor(inp["index"], xq)
    interp.invoke()
    yq = interp.get_tensor(out["index"]).astype(np.int32)
    ours = np.asarray(m.predict_inner(np.asarray(xq))).astype(np.int32)
    assert np.abs(yq - ours).max() <= 1  # expf ULP tolerance (interop contract)


def test_export_trained_model(tmp_path):
    """Train sine for a few steps, export, reload: the exported model's
    quantized outputs stay within 1 LSB of the in-memory trained model
    on the training inputs (bias re-quantization is the only delta)."""
    from microflow_tpu.train import compile_tflite_train

    t = compile_tflite_train(os.path.join(MODELS, "sine.tflite"), 2, "mse",
                             False, name="sine_t")
    x = np.linspace(0.0, 2 * np.pi, 64, dtype=np.float32).reshape(-1, 1)
    gt = t.quantize_target(np.sin(x) * 0.5)  # retarget task
    before = np.asarray(t.predict_inner(t.quantize_input(x)))
    for _ in range(4):
        t.predict_train(x, gt, 0.05)
        t.update_layers(batch_size=64, learning_rate=0.05)
    after = np.asarray(t.predict_inner(t.quantize_input(x)))
    assert np.any(after != before)  # training moved the weights
    path = str(tmp_path / "sine_trained.tflite")
    t.export(path)
    m2 = compile_tflite(path, name="sine_trained_rt")
    got = np.asarray(m2.predict_inner(t.quantize_input(x)))
    assert np.abs(got.astype(np.int32) - after.astype(np.int32)).max() <= 1


def test_export_roundtrip_uint8(tmp_path):
    """uint8-era model (u8 activations AND u8 weights with zp=128)
    survives export: dtype and weight zero-points must roundtrip."""
    from microflow_tpu.models import synth

    src = synth.write(str(tmp_path / "u8.tflite"), synth.uint8_mlp())
    m = compile_tflite(src, name="u8")
    path = str(tmp_path / "u8_rt.tflite")
    m.export(path)
    m2 = compile_tflite(path, name="u8_rt")
    xq = rng.integers(0, 256, (4, 16), dtype=np.uint8)
    np.testing.assert_array_equal(
        np.asarray(m.predict_inner(xq)), np.asarray(m2.predict_inner(xq)))


def _interpreter():
    try:
        from ai_edge_litert.interpreter import Interpreter
    except ImportError:
        tf = pytest.importorskip("tensorflow")
        Interpreter = tf.lite.Interpreter
    return Interpreter


def test_export_trained_lenet_runs_in_official_tflite(tmp_path):
    """Conv-model interop: a TRAINED lenet (conv/pool/fc, stride-1 SAME)
    exported by the engine runs in the official TFLite runtime within
    1 LSB of the engine's own quantized outputs (sine-only until round 4;
    certifies the conv/dwconv/avgpool writer paths end-to-end after the
    update_layers weight mutation, not just the FC one)."""
    from microflow_tpu.models import synth
    from microflow_tpu.train import compile_tflite_train

    Interpreter = _interpreter()
    path = synth.write(str(tmp_path / "lenet.tflite"), synth.lenet())
    t = compile_tflite_train(path, 3, "crossentropy", True, name="lenet_x")
    x = rng.uniform(-1, 1, (64, 12, 12, 1)).astype(np.float32)
    gtq = t.quantize_target(np.eye(10, dtype=np.float32)[rng.integers(0, 10, 64)])
    for _ in range(3):
        t.predict_train(x, gtq, 0.05)
        t.update_layers(batch_size=64, learning_rate=0.05)
    data = t.export()
    out_path = str(tmp_path / "lenet_trained.tflite")
    with open(out_path, "wb") as f:
        f.write(data)
    m2 = compile_tflite(out_path, name="lenet_trained_rt")
    interp = Interpreter(model_content=data)
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    out = interp.get_output_details()[0]
    worst = 0
    for _ in range(8):
        xq = rng.integers(-128, 128, (1, 12, 12, 1), dtype=np.int8)
        interp.set_tensor(inp["index"], xq)
        interp.invoke()
        want = interp.get_tensor(out["index"]).astype(np.int32)
        got = np.asarray(m2.predict_inner(xq)).astype(np.int32)
        worst = max(worst, int(np.abs(got - want).max()))
    assert worst <= 1, f"max deviation {worst} LSB vs official TFLite"


def test_person_detect_legacy_quant_rejected_but_export_loads(tmp_path):
    """The REFERENCE's person_detect.tflite is rejected by modern TFLite
    runtimes: its legacy converter put per-channel quant params
    (quantized_dimension=3) on rank-1 bias tensors, violating the
    qd < rank check (documented in SURVEY.md hard part (c); the schema
    surface is ``microflow-macros/flatbuffers/tflite.fbs:28``).  The
    engine's parser accepts the legacy layout; its EXPORT of the same
    graph normalizes bias quant to per-tensor (scale0/zp0, mirroring
    preprocess folding) while keeping qd=3 on the rank-4 dw weights --
    so the exported bytes load and allocate in the official runtime."""
    Interpreter = _interpreter()
    legacy = os.path.join(MODELS, "person_detect.tflite")
    # The rejection half is runtime-version-dependent: the deprecated
    # tf.lite fallback and older runtimes ACCEPT the legacy layout (it is
    # what produced the file), so only assert rejection when this
    # environment's runtime actually enforces the qd < rank check
    # (round-4 advisor finding).  The engine's contract -- the export
    # loads -- is asserted unconditionally below.
    try:
        interp = Interpreter(model_path=legacy)
        interp.allocate_tensors()
    except ValueError as e:
        assert "quantized_dimension" in str(e)

    m = compile_tflite(legacy, name="pd_interop")
    interp = Interpreter(model_content=m.export())
    interp.allocate_tensors()  # must not raise
    assert interp.get_input_details()[0]["shape"].tolist() == [1, 96, 96, 1]


def test_export_rejects_unsupported_layer():
    """Failure detection: a graph with a layer type export cannot emit
    raises with a clear message instead of writing a corrupt file."""
    from microflow_tpu.frontend.export import export_tflite

    m = compile_tflite(os.path.join(MODELS, "sine.tflite"), name="sine")

    class Alien:
        index = 99
        out_shape = (1,)

    g = m.graph
    layers = g.layers + [Alien()]
    import dataclasses
    g2 = dataclasses.replace(g, layers=layers)
    with pytest.raises(NotImplementedError, match="Alien"):
        export_tflite(g2)
