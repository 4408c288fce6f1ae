"""Column-FC kernel (kernels/colfc.py): batch-on-lanes tiny-FC chains.

Parity contract: bit-identical to the XLA backend (the oracle) on the
sine golden and on writer-fabricated FC chains spanning K0 > 1, all
activations, and non-zero input zero points.  Interpret mode on CPU;
the TPU timing A/B lives in scripts/ab_colfc.py.
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from microflow_tpu import compile_tflite
from microflow_tpu.compiler.builder import build
from microflow_tpu.frontend.parser import parse
from microflow_tpu.frontend.tflite import ActivationFunctionType as Act
from microflow_tpu.frontend.tflite import BuiltinOperator as Op
from microflow_tpu.frontend.tflite import TensorType
from microflow_tpu.frontend.writer import ModelWriter
from microflow_tpu.kernels.colfc import build_col_kernel, plan_col

MODELS = os.path.join(os.path.dirname(__file__), "..", "models")
I8, I32 = TensorType.INT8, TensorType.INT32


def test_sine_plan_and_golden():
    m = compile_tflite(os.path.join(MODELS, "sine.tflite"), name="sine",
                       backend="xla")
    assert plan_col(m.graph) is not None
    col_fn, meta = build_col_kernel(m.graph, tb=2, interpret=True)
    assert (meta["k0"], meta["n_out"]) == (1, 1)
    rng = np.random.default_rng(0)
    B = 512
    xq = rng.integers(-128, 128, (B, 1), dtype=np.int8)
    want = np.asarray(m.predict_inner(xq))
    got = np.asarray(col_fn(jnp.asarray(xq.reshape(1, B)))).reshape(B, 1)
    np.testing.assert_array_equal(got, want)


def _fc_chain(seed: int, dims, acts) -> bytes:
    rng = np.random.default_rng(seed)
    m = ModelWriter(f"colfc-{seed}")
    cur = m.tensor([1, dims[0]], I8, 0.04, int(rng.integers(-64, 64)),
                   name="input")
    x_in = cur
    for i, (k, n) in enumerate(zip(dims, dims[1:])):
        wq = rng.integers(-127, 128, (n, k), dtype=np.int8)
        w_t = m.tensor([n, k], I8, 0.02, 0, data=wq, name=f"w{i}")
        b_t = m.tensor([n], I32, 0.0008, 0,
                       data=rng.integers(-500, 500, n, dtype=np.int32),
                       name=f"b{i}")
        y = m.tensor([1, n], I8, float(rng.uniform(0.01, 0.08)),
                     int(rng.integers(-128, 64)), name=f"y{i}")
        m.add_op(Op.FULLY_CONNECTED, [cur, w_t, b_t], [y],
                 m.fc_options(acts[i]))
        cur = y
    return m.finish([x_in], [cur])


@pytest.mark.parametrize("seed,dims,acts", [
    (0, (1, 16, 16, 1), (Act.NONE, Act.RELU, Act.NONE)),
    (1, (4, 8, 2), (Act.RELU6, Act.NONE)),
    (2, (32, 32, 32), (Act.RELU, Act.RELU6)),
    (3, (3, 5, 7), (Act.NONE, Act.RELU)),
])
def test_fabricated_fc_chains_bit_exact(seed, dims, acts, tmp_path):
    path = str(tmp_path / f"fc{seed}.tflite")
    with open(path, "wb") as f:
        f.write(_fc_chain(seed, dims, acts))
    g = parse(path, frontend="python")
    m = build(g)
    res = build_col_kernel(g, tb=2, interpret=True)
    assert res is not None, "plan rejected a supported chain"
    col_fn, meta = res
    rng = np.random.default_rng(100 + seed)
    B = 256
    xq = rng.integers(-128, 128, (B, dims[0]), dtype=np.int8)
    want = np.asarray(m.predict_inner(xq))
    got = np.asarray(col_fn(jnp.asarray(xq.T.copy()))).T
    np.testing.assert_array_equal(got, want)


def test_plan_rejects_wide_and_conv_graphs():
    speech = parse(os.path.join(MODELS, "speech.tflite"))
    assert plan_col(speech) is None  # conv layer + K=4000


@pytest.mark.skipif(jax.default_backend() not in ("tpu", "axon"),
                    reason="colfc backend compiles Mosaic (TPU only)")
def test_colfc_backend_end_to_end_golden():
    """backend='colfc' through the public API: the sine golden must be
    bit-exact, including the batch pad + transpose boundary."""
    m = compile_tflite(os.path.join(MODELS, "sine.tflite"), name="sine_colfc",
                       backend="colfc")
    out = np.asarray(m.predict(np.array([[0.5]], np.float32)))
    np.testing.assert_array_equal(out, np.array([[0.41348344]], np.float32))
    ref = compile_tflite(os.path.join(MODELS, "sine.tflite"), name="sine",
                         backend="xla")
    rng = np.random.default_rng(3)
    xq = rng.integers(-128, 128, (37, 1), dtype=np.int8)  # non-tile batch
    np.testing.assert_array_equal(np.asarray(m.predict_inner(xq)),
                                  np.asarray(ref.predict_inner(xq)))
