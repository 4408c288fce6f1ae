"""Native (C++) front-end parity: the ctypes-bound parser must produce a
Graph identical to the pure-Python flatbuffer reader on every model."""

import os

import numpy as np
import pytest

from microflow_tpu import native
from microflow_tpu.frontend.parser import parse

MODELS = os.path.join(os.path.dirname(__file__), "..", "models")

pytestmark = pytest.mark.skipif(not native.available(), reason="no C++ toolchain")


def _graphs_equal(a, b):
    assert len(a.layers) == len(b.layers)
    assert a.input_shape == b.input_shape and a.output_shape == b.output_shape
    for la, lb in zip(a.layers, b.layers):
        assert type(la) is type(lb)
        for field in vars(la):
            va, vb = getattr(la, field), getattr(lb, field)
            if isinstance(va, np.ndarray):
                assert np.array_equal(va, vb), (type(la).__name__, field)
            elif hasattr(va, "scale"):  # QuantInfo
                assert np.array_equal(va.scale, vb.scale)
                assert np.array_equal(va.zero_point, vb.zero_point)
            else:
                assert va == vb, (type(la).__name__, field)


@pytest.mark.parametrize("model", ["sine", "speech", "person_detect"])
def test_native_matches_python(model):
    path = os.path.join(MODELS, f"{model}.tflite")
    _graphs_equal(parse(path, frontend="native"), parse(path, frontend="python"))


def test_native_rejects_garbage():
    with pytest.raises(ValueError):
        native.parse_metadata(b"\x00" * 64)


def test_native_fold_matches_python():
    """The C++ mf_fold_* constant folding must be bit-identical to the
    numpy oracle on every layer of every bundled model."""
    import numpy as np
    import pytest

    from microflow_tpu import native
    from microflow_tpu.compiler import folding
    from microflow_tpu.frontend import parser

    if not native.available():
        pytest.skip("native component unavailable")

    for name in ("sine", "speech", "person_detect"):
        path = os.path.join(MODELS, f"{name}.tflite")
        # parse twice: once forcing the numpy fold, once the native fold
        orig = folding._native
        try:
            folding._native = lambda: None
            g_py = parser.parse(path, frontend="python")
        finally:
            folding._native = orig
        g_nat = parser.parse(path, frontend="python")
        for lp, ln in zip(g_py.layers, g_nat.layers):
            for attr in ("c0", "c1", "c2", "c3"):
                a, b = getattr(lp, attr, None), getattr(ln, attr, None)
                if a is None:
                    continue
                assert np.array_equal(np.asarray(a), np.asarray(b)), (name, lp.index, attr)
