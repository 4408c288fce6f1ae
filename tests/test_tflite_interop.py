"""Interop with the OFFICIAL TFLite runtime.

The strongest external validation available: a model fabricated by the
engine's own writer must (a) load in ``tf.lite.Interpreter`` and (b)
produce outputs matching this engine within 1 LSB (TFLite requantizes
through fixed-point multipliers where the reference/this engine use exact
f32; both round the same real value, so results differ by at most one
output quantum on ties).

Only stride-1 SAME geometry is compared: for stride-2 SAME the reference
pads top/left ((K-1)/2), while TFLite balances bottom/right-heavy -- a
documented semantic difference (core/tensor.py), not a bug.
"""

import numpy as np
import pytest


def _interpreter_cls():
    """Official interpreter: LiteRT when present, else tf.lite (deprecated
    in TF 2.20 -- docs/ROADMAP.md)."""
    try:
        from ai_edge_litert.interpreter import Interpreter

        return Interpreter
    except ImportError:
        tf = pytest.importorskip("tensorflow")
        return tf.lite.Interpreter


Interpreter = _interpreter_cls()

from microflow_tpu.compiler.builder import build
from microflow_tpu.frontend import parser
from microflow_tpu.models import synth


@pytest.fixture(scope="module")
def lenet_bytes():
    return synth.lenet()


def test_official_interpreter_loads_and_runs(lenet_bytes, tmp_path):
    interp = Interpreter(model_content=lenet_bytes)
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    out = interp.get_output_details()[0]
    assert inp["shape"].tolist() == [1, 12, 12, 1]
    assert out["shape"].tolist() == [1, 10]
    assert inp["dtype"] == np.int8 and out["dtype"] == np.int8


def test_engine_matches_official_interpreter(lenet_bytes, tmp_path):
    path = str(tmp_path / "lenet.tflite")
    with open(path, "wb") as f:
        f.write(lenet_bytes)
    model = build(parser.parse(path, name="lenet"))

    interp = Interpreter(model_content=lenet_bytes)
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    out = interp.get_output_details()[0]

    rng = np.random.default_rng(17)
    worst = 0
    for _ in range(8):
        xq = rng.integers(-128, 128, (1, 12, 12, 1), dtype=np.int8)
        interp.set_tensor(inp["index"], xq)
        interp.invoke()
        want = interp.get_tensor(out["index"]).astype(np.int32)
        got = np.asarray(model.predict_inner(xq)).astype(np.int32)
        worst = max(worst, int(np.abs(got - want).max()))
    # <= 1 LSB: TFLite's fixed-point requant vs the engine's exact-f32
    # requant (the reference's own accuracy analysis shows the same +-1)
    assert worst <= 1, f"max deviation {worst} LSB vs official TFLite"


@pytest.mark.parametrize("name,shape", [("sine", (1, 1)), ("speech", (1, 1960))])
def test_bundled_models_match_official_interpreter(name, shape):
    """The engine vs Google's runtime on the REFERENCE'S OWN models.

    sine (pure FC) and speech (10x8/s2 dwconv whose even-kernel SAME
    padding coincides between the reference's (K-1)/2 shift and TFLite's
    balanced scheme) are directly comparable; person_detect is not (odd-k
    stride-2 SAME pads differently by design -- the reference's semantics
    are the parity target there, anchored by its checked-in goldens)."""
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "models", f"{name}.tflite")
    model = build(parser.parse(path, name=name))
    interp = Interpreter(model_path=path)
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    out = interp.get_output_details()[0]

    rng = np.random.default_rng(23)
    worst = 0
    for _ in range(4):
        xq = rng.integers(-128, 128, shape, dtype=np.int8)
        interp.set_tensor(inp["index"], xq)
        interp.invoke()
        want = interp.get_tensor(out["index"]).astype(np.int32)
        got = np.asarray(model.predict_inner(xq)).astype(np.int32)
        worst = max(worst, int(np.abs(got - want).max()))
    assert worst <= 1, f"{name}: max deviation {worst} LSB vs official TFLite"
