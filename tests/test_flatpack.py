"""Flat-sample kernel (kernels/flatpack.py) bit-parity vs the XLA path.

The flat backend runs the conv prefix of person_detect as one Pallas
kernel in a [TB, H*W*C] batch-on-sublanes layout (reference hot loops
``src/ops/depthwise_conv_2d.rs:100-109``, ``conv_2d.rs:92-99``); its
contract is bit-identical int8 activations at every layer boundary, so
full-model outputs must match XLA exactly on ANY input.
"""

import os

import numpy as np
import pytest

from microflow_tpu import compile_tflite
from microflow_tpu.frontend.parser import parse
from microflow_tpu.kernels.flatpack import plan_flat

MODELS = os.path.join(os.path.dirname(__file__), "..", "models")
PERSON = os.path.join(MODELS, "person_detect.tflite")


def test_plan_covers_conv_prefix():
    graph = parse(PERSON)
    plan = plan_flat(graph)
    assert plan is not None
    ops, n_layers, meta = plan
    assert n_layers >= 7  # at least the C<64 hot prefix
    for op in ops:
        assert op.lanes_out_p % 128 == 0
        if op.kind == "softmax":
            assert op.sm_mask.sum() == op.lanes_out
            continue
        if op.kind == "taps":
            # every real output lane inside some tap span; center tap
            # covers the whole padded buffer
            assert (0, op.lanes_out_p) in op.tap_ranges
            continue
        # every chunk holding a real output lane is covered exactly
        # once by the groups (dead padding chunks may be skipped)
        covered = sorted((out_lo, out_lo + op.mats[parts[0][1]].shape[1])
                         for out_lo, parts in op.groups)
        real_lo = (op.out_off // 128) * 128
        real_hi = -(-(op.out_off + op.lanes_out) // 128) * 128
        assert covered[0][0] <= real_lo and covered[-1][1] >= real_hi
        for (a, b), (c, d) in zip(covered, covered[1:]):
            assert b == c


def test_plan_phase_offsets_cut_mxu_slots():
    """Round-3 lever: cost-driven per-edge lane offsets align dw
    windows to chunk boundaries, and VPU tap ops take the C%128==0 dw
    layers off the MXU entirely.  Guard the win statically."""
    graph = parse(PERSON)
    base = plan_flat(graph, use_offsets=False, use_taps=False)
    new = plan_flat(graph)
    slots_base = sum(op.slots() for op in base[0])
    slots_new = sum(op.slots() for op in new[0])
    assert slots_new < 0.75 * slots_base, (slots_new, slots_base)
    assert any(op.kind == "taps" for op in new[0])
    assert any(op.in_off != op.out_off for op in new[0])


def test_plan_covers_fc_graphs():
    """Round-3 widening: FullyConnected layers pack as dense dot groups
    (window-split at max_window), so the pure-FC sine graph and the
    dw+fc speech graph plan to FULL coverage."""
    for name, n_layers in (("sine.tflite", 3), ("speech.tflite", 4)):
        graph = parse(os.path.join(MODELS, name))
        plan = plan_flat(graph)
        assert plan is not None, name
        assert plan[1] == n_layers, (name, plan[1])


def test_plan_rejects_non_int8_input():
    import tempfile

    from microflow_tpu.models import synth

    path = os.path.join(tempfile.mkdtemp(), "u8.tflite")
    synth.write(path, synth.uint8_mlp())
    graph = parse(path)
    assert plan_flat(graph) is None


def test_flat_interpret_fc_models():
    """Interpret-mode bit-parity of the FC-extended flat kernel vs the
    XLA layer chain on the two non-image bundled models (full-model
    coverage incl. the 4000-wide speech FC split into two windows)."""
    import jax.numpy as jnp

    from microflow_tpu.compiler.builder import apply_layer, init_params
    from microflow_tpu.kernels.flatpack import build_flat_kernel

    rng = np.random.default_rng(29)
    for name in ("sine.tflite", "speech.tflite"):
        g = parse(os.path.join(MODELS, name))
        params = init_params(g)
        res = build_flat_kernel(g, tb=8, interpret=True)
        assert res is not None, name
        flat_fn, n, meta = res
        assert n == len(g.layers), name
        k = int(np.prod(g.input_shape))
        xq = rng.integers(-128, 128, (8, k), dtype=np.int8)
        want = jnp.asarray(xq).reshape(8, *g.input_shape)
        for layer in g.layers[:n]:
            want = apply_layer(layer, params, want, "xla")
        off = meta["out_off"]
        got = np.asarray(flat_fn(jnp.asarray(xq)))[:, off : off + meta["out_lanes"]]
        assert np.array_equal(got, np.asarray(want).reshape(8, -1)), name


def test_plan_oracle_first_layers():
    """Group matrices reproduce the stem + dw taps: apply the planned
    mats to a random flat sample on the CPU and compare the i32
    accumulator against the reference patch extraction oracle."""
    import jax.numpy as jnp

    from microflow_tpu.ops.depthwise_conv_2d import (
        depthwise_conv_2d_accumulate_patches,
    )

    graph = parse(PERSON)
    ops, _, meta = plan_flat(graph, max_layers=2)  # plan needs >= 2 layers
    op = ops[0]
    layer = graph.layers[0]
    rng = np.random.default_rng(3)
    x = rng.integers(-128, 128, (2, *graph.input_shape), dtype=np.int8)
    want = np.asarray(depthwise_conv_2d_accumulate_patches(
        jnp.asarray(x), jnp.asarray(layer.weights), layer.geom,
        layer.in_q.zp0, np.zeros(layer.weights.shape[2], np.int32)))
    x2 = np.zeros((2, op.lanes_in_p), np.int32)
    x2[:, op.in_off : op.in_off + op.lanes_in] = x.reshape(2, -1)
    got = np.zeros((2, op.lanes_out_p), np.int32)
    for out_lo, parts in op.groups:
        for lo, cid in parts:
            m = op.mats[cid].astype(np.int32)
            got[:, out_lo : out_lo + m.shape[1]] += x2[:, lo : lo + m.shape[0]] @ m
    got += op.d_plane.astype(np.int32)
    real = got[:, op.out_off : op.out_off + op.lanes_out]
    assert np.array_equal(real.reshape(want.shape), want)


def _require_compiled_pallas():
    """The compiled (non-interpret) flat kernel needs a real TPU; on the
    CPU backend Pallas only supports interpret mode (covered by the
    interpret-mode twins above)."""
    import jax

    if jax.default_backend() == "cpu":
        pytest.skip("compiled Pallas kernels need TPU")


@pytest.mark.slow
def test_flat_parity_person_detect():
    _require_compiled_pallas()
    rng = np.random.default_rng(13)
    ref = compile_tflite(PERSON, backend="xla")
    os.environ["MFT_FLAT_TB"] = "32"
    try:
        alt = compile_tflite(PERSON, backend="flat")
    finally:
        del os.environ["MFT_FLAT_TB"]
    # batch 3 exercises the tb-padding path (3 % tb != 0)
    x = rng.uniform(0.0, 1.0, (3, 96, 96, 1)).astype(np.float32)
    a = np.asarray(ref.predict(x))
    b = np.asarray(alt.predict(x))
    assert np.array_equal(a, b), f"flat: max|d|={np.abs(a - b).max()}"
    xq = rng.integers(-128, 128, (5, 96, 96, 1), dtype=np.int8)
    aq = np.asarray(ref.predict_inner(xq))
    bq = np.asarray(alt.predict_inner(xq))
    assert np.array_equal(aq, bq)


@pytest.mark.slow
def test_flat_fixed_requant_within_1lsb():
    """The integer (M, S) epilogue (core/fixedpoint.py) living inside
    the hot kernel stays within 1 output LSB of the exact path at every
    flat-kernel boundary -- checked on the full-model int8 outputs."""
    _require_compiled_pallas()
    rng = np.random.default_rng(17)
    ref = compile_tflite(PERSON, backend="xla")
    os.environ["MFT_FLAT_TB"] = "32"
    os.environ["MFT_FLAT_REQUANT"] = "fixed"
    try:
        alt = compile_tflite(PERSON, backend="flat")
    finally:
        del os.environ["MFT_FLAT_TB"], os.environ["MFT_FLAT_REQUANT"]
    xq = rng.integers(-128, 128, (8, 96, 96, 1), dtype=np.int8)
    aq = np.asarray(ref.predict_inner(xq)).astype(np.int32)
    bq = np.asarray(alt.predict_inner(xq)).astype(np.int32)
    # intermediate <=1 LSB deviations may compound slightly through the
    # deep stack; the reference's own accuracy analysis tolerates the
    # same vs TFLite.  Gate at <=2 LSB on the final softmax-scale int8.
    assert np.abs(aq - bq).max() <= 2, np.abs(aq - bq).max()


def test_flat_interpret_synth_model(tmp_path):
    """Flat kernel vs XLA on a writer-synthesized conv stack, in Pallas
    interpret mode (runs on any backend): exercises per-channel dw
    scales, stride-2, a non-elided relu6 clip (out zp != -128), and the
    4-conv plan on a second graph shape."""
    import jax.numpy as jnp

    from microflow_tpu.compiler.builder import apply_layer, init_params
    from microflow_tpu.kernels.flatpack import build_flat_kernel
    from microflow_tpu.models import synth

    path = str(tmp_path / "flat_conv.tflite")
    synth.write(path, synth.flat_conv())
    g = parse(path)
    res = build_flat_kernel(g, tb=8, interpret=True)
    assert res is not None
    flat_fn, n, meta = res
    assert n == 7  # conv stack + reshape/fc/softmax tail all pack
    params = init_params(g)
    rng = np.random.default_rng(23)
    xq = rng.integers(-128, 128, (8, 16, 16, 2), dtype=np.int8)
    want = jnp.asarray(xq)
    for layer in g.layers[:n]:
        want = apply_layer(layer, params, want, "xla")
    off = meta["out_off"]
    got = np.asarray(flat_fn(jnp.asarray(xq).reshape(8, -1)))
    got = got[:, off : off + meta["out_lanes"]]
    assert np.array_equal(got, np.asarray(want).reshape(8, -1))


def test_unpackable_graph_raises_clear_error(tmp_path):
    """backend='flat'/'packed' on an unpackable graph fails at compile
    time with an actionable message, not at first predict."""
    from microflow_tpu.models import synth

    u8 = str(tmp_path / "u8.tflite")
    synth.write(u8, synth.uint8_mlp())
    with pytest.raises(ValueError, match="flat-packable"):
        compile_tflite(u8, backend="flat")
    with pytest.raises(ValueError, match="packable"):
        compile_tflite(os.path.join(MODELS, "sine.tflite"), backend="packed")


def test_auto_backend_resolves_and_stays_golden():
    """backend="auto" resolves to a concrete backend (flat only on TPU
    with a packable conv graph; xla everywhere else) and the resolved
    model keeps the reference golden (tests/sine.rs / person_detect.rs)."""
    import jax

    from microflow_tpu import compile_tflite

    m = compile_tflite(os.path.join(MODELS, "sine.tflite"), backend="auto")
    assert m.backend == "xla"  # pure-FC graphs always stay on XLA
    assert float(np.asarray(m.predict([[0.5]]))[0, 0]) == pytest.approx(
        0.41348344, abs=1e-7)

    m = compile_tflite(PERSON, backend="auto")
    expect = "flat" if jax.default_backend() == "tpu" else "xla"
    assert m.backend == expect
    # warm() routes the golden predict through the engine's HLO-keyed
    # executable cache: on repeat suite runs the ~6 min Mosaic compile
    # of the flat kernel becomes a disk load (any kernel/code change
    # changes the lowered HLO and recompiles, so coverage is unchanged)
    m.warm(1)
    out = np.asarray(m.predict(np.full((1, 96, 96, 1), 0.5, np.float32)))
    assert out.reshape(-1).tolist() == [0.8046875, 0.1953125]


def test_default_backend_env_override():
    from microflow_tpu.compiler.builder import default_backend

    saved = os.environ.pop("MFT_BACKEND", None)
    try:
        assert default_backend() == "auto"  # flat-on-TPU, xla elsewhere
        os.environ["MFT_BACKEND"] = "pallas"
        assert default_backend() == "pallas"
        os.environ["MFT_BACKEND"] = "falt"
        with pytest.raises(ValueError, match="falt"):
            default_backend()
    finally:
        os.environ.pop("MFT_BACKEND", None)
        if saved is not None:
            os.environ["MFT_BACKEND"] = saved
