"""Writer<->parser property fuzz (round-2 VERDICT next #9).

Random-but-valid int8 graphs generated through ``frontend/writer.py``
must roundtrip identically through BOTH parsers (pure-Python flatbuffer
reader and the native C++ one) and compile+run.  This replaces trust in
a handful of fixed synth models with seeded structural coverage of the
schema surface the reference's generated bindings span
(``microflow-macros/flatbuffers/tflite.fbs:28``): kernel sizes 1-3,
strides 1-2, SAME/VALID, all activations, per-tensor AND per-channel
(quantized_dimension=3) weights, depth-multiplier stems, pools,
reshapes, FC chains, softmax heads.
"""

import os

import numpy as np
import pytest

from microflow_tpu import native
from microflow_tpu.compiler.builder import build
from microflow_tpu.frontend.parser import parse
from microflow_tpu.frontend.tflite import ActivationFunctionType as Act
from microflow_tpu.frontend.tflite import BuiltinOperator as Op
from microflow_tpu.frontend.tflite import Padding, TensorType
from microflow_tpu.frontend.writer import ModelWriter

from test_native_frontend import _graphs_equal

I8 = TensorType.INT8
I32 = TensorType.INT32

ACTS = [Act.NONE, Act.RELU, Act.RELU6]


def _out_dim(n, k, s, pad):
    if pad == Padding.SAME:
        return -(-n // s)
    return -(-(n - k + 1) // s)


def _rand_graph(seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    m = ModelWriter(f"fuzz-{seed}")
    h = int(rng.integers(4, 13))
    w = int(rng.integers(4, 13))
    c = int(rng.choice([1, 2, 3, 4, 8]))
    shape = (h, w, c)
    in_s = float(rng.uniform(0.005, 0.1))
    in_zp = int(rng.integers(-64, 64))
    cur = x_in = m.tensor([1, *shape], I8, in_s, in_zp, name="input")
    cur_s, cur_zp = in_s, in_zp

    def act_tensor(shape, name):
        nonlocal cur_s, cur_zp
        cur_s = float(rng.uniform(0.005, 0.1))
        cur_zp = int(rng.integers(-128, 64))
        return m.tensor([1, *shape], I8, cur_s, cur_zp, name=name)

    n_ops = int(rng.integers(1, 5))
    for i in range(n_ops):
        kind = rng.choice(["conv", "dw", "pool"]) if len(shape) == 3 else "fc"
        kh, kw = int(rng.integers(1, 4)), int(rng.integers(1, 4))
        sh, sw = int(rng.choice([1, 2])), int(rng.choice([1, 2]))
        pad = Padding.SAME if rng.random() < 0.7 else Padding.VALID
        act = ACTS[int(rng.integers(0, 3))]
        hh, ww_, cc = shape
        if kh > hh or kw > ww_:
            pad = Padding.SAME
        oh, ow = _out_dim(hh, kh, sh, pad), _out_dim(ww_, kw, sw, pad)
        if oh < 1 or ow < 1:
            continue
        if kind == "conv":
            f = int(rng.integers(1, 9))
            per_ch = rng.random() < 0.4
            wdata = rng.normal(0, 0.3, (f, kh, kw, cc)).astype(np.float32)
            if per_ch:
                ws = np.maximum(np.abs(wdata).max(axis=(1, 2, 3)) / 127.0,
                                1e-6).astype(np.float32)
                q = np.clip(np.round(wdata / ws[:, None, None, None]),
                            -127, 127).astype(np.int8)
                t_w = m.tensor([f, kh, kw, cc], I8, ws,
                               np.zeros(f, np.int64), data=q, name=f"w{i}",
                               quantized_dimension=0)
                bs = (cur_s * ws).astype(np.float32)
            else:
                ws = float(np.maximum(np.abs(wdata).max() / 127.0, 1e-6))
                q = np.clip(np.round(wdata / ws), -127, 127).astype(np.int8)
                t_w = m.tensor([f, kh, kw, cc], I8, ws, 0, data=q, name=f"w{i}")
                bs = np.float32(cur_s * ws)
            b = np.round(rng.normal(0, 0.05, f) / bs).astype(np.int32)
            t_b = m.tensor([f], I32, bs, np.zeros(f, np.int64) if per_ch else 0,
                           data=b, name=f"b{i}")
            out = act_tensor((oh, ow, f), f"conv{i}")
            m.add_op(Op.CONV_2D, [cur, t_w, t_b], [out],
                     m.conv_options(pad, (sh, sw), act))
            cur, shape = out, (oh, ow, f)
        elif kind == "dw":
            mult = int(rng.choice([1, 2])) if cc == 1 else 1
            ch = cc * mult
            wdata = rng.normal(0, 0.3, (1, kh, kw, ch)).astype(np.float32)
            per_ch = rng.random() < 0.4
            if per_ch:
                ws = np.maximum(np.abs(wdata).max(axis=(0, 1, 2)) / 127.0,
                                1e-6).astype(np.float32)
                q = np.clip(np.round(wdata / ws[None, None, None, :]),
                            -127, 127).astype(np.int8)
                t_w = m.tensor([1, kh, kw, ch], I8, ws,
                               np.zeros(ch, np.int64), data=q, name=f"w{i}",
                               quantized_dimension=3)
                bs = (cur_s * ws).astype(np.float32)
                bz = np.zeros(ch, np.int64)
            else:
                ws = float(np.maximum(np.abs(wdata).max() / 127.0, 1e-6))
                q = np.clip(np.round(wdata / ws), -127, 127).astype(np.int8)
                t_w = m.tensor([1, kh, kw, ch], I8, ws, 0, data=q, name=f"w{i}")
                bs, bz = np.float32(cur_s * ws), 0
            b = np.round(rng.normal(0, 0.05, ch) / np.asarray(bs)).astype(np.int32)
            t_b = m.tensor([ch], I32, bs, bz, data=b, name=f"b{i}")
            out = act_tensor((oh, ow, ch), f"dw{i}")
            m.add_op(Op.DEPTHWISE_CONV_2D, [cur, t_w, t_b], [out],
                     m.dwconv_options(pad, (sh, sw), mult, act))
            cur, shape = out, (oh, ow, ch)
        elif kind == "pool":
            kh = min(kh, hh)
            kw = min(kw, ww_)
            oh, ow = _out_dim(hh, kh, sh, Padding.VALID), _out_dim(ww_, kw, sw, Padding.VALID)
            if oh < 1 or ow < 1:
                continue
            out = m.tensor([1, oh, ow, cc], I8, cur_s, cur_zp, name=f"pool{i}")
            m.add_op(Op.AVERAGE_POOL_2D, [cur], [out],
                     m.pool_options(Padding.VALID, (sh, sw), (kh, kw), Act.NONE))
            cur, shape = out, (oh, ow, cc)

    # flatten + FC head + softmax (the reference's canonical tail)
    n = int(np.prod(shape))
    if len(shape) == 3:
        flat = m.tensor([1, n], I8, cur_s, cur_zp, name="flat")
        m.add_op(Op.RESHAPE, [cur], [flat], m.reshape_options([1, n]))
        cur = flat
    n_cls = int(rng.integers(2, 6))
    wdata = rng.normal(0, 0.2, (n_cls, n)).astype(np.float32)
    ws = float(np.maximum(np.abs(wdata).max() / 127.0, 1e-6))
    q = np.clip(np.round(wdata / ws), -127, 127).astype(np.int8)
    t_w = m.tensor([n_cls, n], I8, ws, 0, data=q, name="fc_w")
    b = np.round(rng.normal(0, 0.05, n_cls) / (cur_s * ws)).astype(np.int32)
    t_b = m.tensor([n_cls], I32, cur_s * ws, 0, data=b, name="fc_b")
    logits = m.tensor([1, n_cls], I8, 0.05, 0, name="logits")
    m.add_op(Op.FULLY_CONNECTED, [cur, t_w, t_b], [logits], m.fc_options(Act.NONE))
    probs = m.tensor([1, n_cls], I8, 1 / 256.0, -128, name="probs")
    m.add_op(Op.SOFTMAX, [logits], [probs], m.softmax_options(1.0))
    return m.finish([x_in], [probs])


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_writer_parser_roundtrip(seed, tmp_path):
    data = _rand_graph(seed)
    path = str(tmp_path / f"fuzz{seed}.tflite")
    with open(path, "wb") as f:
        f.write(data)
    g_py = parse(path, frontend="python")
    if native.available():
        _graphs_equal(parse(path, frontend="native"), g_py)
    # the graph must also compile and run on the exact integer path
    model = build(g_py)
    rng = np.random.default_rng(seed)
    xq = rng.integers(-128, 128, (2, *g_py.input_shape), dtype=np.int8)
    y = np.asarray(model.predict_inner(xq))
    assert y.shape == (2, *g_py.output_shape)
    assert y.dtype == np.int8


def test_fuzz_flat_planner_interpret_parity(tmp_path):
    """Flat-kernel planner fuzz: every random graph the planner accepts
    must be bit-identical to the XLA layer chain in interpret mode, and
    the planned prefix must end on an emitted op (the suffix resumes
    from ``meta['out_shape']``).  Catches planner corner cases (offsets,
    window splits, reshape handling) the 3 bundled models never hit."""
    import jax
    import jax.numpy as jnp

    from microflow_tpu.compiler.builder import apply_layer, init_params
    from microflow_tpu.kernels.flatpack import build_flat_kernel, plan_flat

    # interpret-mode kernels are pure jnp numerics: run them on the
    # local CPU devices -- on the TPU relay every tiny op is a ~2 ms
    # remote dispatch and this test alone costs ~8 min (measured)
    cpu = jax.devices("cpu")[0]
    planned = 0
    for seed in range(24):
        path = str(tmp_path / f"fuzz{seed}.tflite")
        with open(path, "wb") as f:
            f.write(_rand_graph(seed))
        g = parse(path, frontend="python")
        plan = plan_flat(g)
        if plan is None:
            continue
        ops, n, meta = plan
        assert ops[-1].layer_idx == n - 1, seed
        planned += 1
        res = build_flat_kernel(g, tb=2, interpret=True)
        assert res is not None, seed
        flat_fn, n, meta = res
        rng = np.random.default_rng(100 + seed)
        xq = rng.integers(-128, 128, (2, int(np.prod(g.input_shape))),
                          dtype=np.int8)
        with jax.default_device(cpu):
            params = init_params(g)
            want = jnp.asarray(xq).reshape(2, *g.input_shape)
            for layer in g.layers[:n]:
                want = apply_layer(layer, params, want, "xla")
            off = meta["out_off"]
            got = np.asarray(flat_fn(jnp.asarray(xq)))[:, off:off + meta["out_lanes"]]
        assert np.array_equal(got, np.asarray(want).reshape(2, -1)), seed
    assert planned >= 4, planned  # the generator must exercise the planner


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_export_roundtrip(seed, tmp_path):
    """Export fuzz: every random graph must survive
    writer -> parse -> export -> parse with bit-identical predictions
    (the export inverts the parser's decode transforms; see
    frontend/export.py)."""
    from microflow_tpu.frontend.export import export_tflite

    path = str(tmp_path / f"fz{seed}.tflite")
    with open(path, "wb") as f:
        f.write(_rand_graph(1000 + seed))
    g = parse(path, frontend="python")
    m = build(g)
    path2 = str(tmp_path / f"fz{seed}_rt.tflite")
    with open(path2, "wb") as f:
        f.write(export_tflite(g))
    m2 = build(parse(path2, frontend="python"))
    rng = np.random.default_rng(seed)
    xq = rng.integers(-128, 128, (2, *g.input_shape), dtype=np.int8)
    np.testing.assert_array_equal(
        np.asarray(m.predict_inner(xq)), np.asarray(m2.predict_inner(xq)))


# --- loud rejection of unsupported model features (round-4 VERDICT #6) -------
# The reference aborts compilation on anything it cannot honor
# (``microflow-macros/src/lib.rs:134`` ``abort_call_site!``); a parity
# engine must abort, never miscompile.  Each fabricated model flips ONE
# decoded-but-previously-ignored knob and must fail to parse on BOTH
# front-ends.


def _conv_model(conv_fields=None, fc_fields=None, num_subgraphs=1,
                extra_input=False, extra_output=False, dw_fields=None,
                dw_in_c=None):
    """A tiny valid conv(+fc) int8 model with injectable option fields."""
    rng = np.random.default_rng(7)
    m = ModelWriter("reject-fuzz")
    in_c = dw_in_c if dw_in_c is not None else 2
    x_in = m.tensor([1, 6, 6, in_c], I8, 0.05, 0, name="input")
    if dw_fields is not None or dw_in_c is not None:
        ch = 4
        wq = rng.integers(-127, 128, (1, 3, 3, ch), dtype=np.int8)
        w_t = m.tensor([1, 3, 3, ch], I8, 0.02, 0, data=wq, name="dwW")
        b_t = m.tensor([ch], I32, 0.001, 0,
                       data=np.zeros(ch, np.int32), name="dwB")
        y = m.tensor([1, 6, 6, ch], I8, 0.04, 0, name="dwY")
        fields = dw_fields if dw_fields is not None else m.dwconv_options(
            Padding.SAME, (1, 1), ch // in_c, Act.NONE)
        m.add_op(Op.DEPTHWISE_CONV_2D, [x_in, w_t, b_t], [y], fields)
        out = y
    else:
        f = 3
        wq = rng.integers(-127, 128, (f, 3, 3, in_c), dtype=np.int8)
        w_t = m.tensor([f, 3, 3, in_c], I8, 0.02, 0, data=wq, name="convW")
        b_t = m.tensor([f], I32, 0.001, 0,
                       data=np.zeros(f, np.int32), name="convB")
        y = m.tensor([1, 6, 6, f], I8, 0.04, 0, name="convY")
        fields = conv_fields if conv_fields is not None else m.conv_options(
            Padding.SAME, (1, 1), Act.NONE)
        m.add_op(Op.CONV_2D, [x_in, w_t, b_t], [y], fields)
        out = y
    if fc_fields is not None:
        k = 6 * 6 * 3
        wq = rng.integers(-127, 128, (4, k), dtype=np.int8)
        w_t = m.tensor([4, k], I8, 0.02, 0, data=wq, name="fcW")
        b_t = m.tensor([4], I32, 0.001, 0,
                       data=np.zeros(4, np.int32), name="fcB")
        z = m.tensor([1, 4], I8, 0.03, 0, name="fcY")
        m.add_op(Op.FULLY_CONNECTED, [out, w_t, b_t], [z], fc_fields)
        out = z
    inputs = [x_in]
    outputs = [out]
    if extra_input:
        inputs.append(m.tensor([1, 4], I8, 0.1, 0, name="aux_in"))
    if extra_output:
        outputs.append(x_in)
    return m.finish(inputs, outputs, num_subgraphs=num_subgraphs)


def _assert_rejected(data, tmp_path, match):
    path = str(tmp_path / "reject.tflite")
    with open(path, "wb") as f:
        f.write(data)
    with pytest.raises((NotImplementedError, ValueError), match=match):
        parse(path, frontend="python")
    if native.available():
        with pytest.raises((NotImplementedError, ValueError), match=match):
            parse(path, frontend="native")


def test_reject_dilated_conv(tmp_path):
    fields = ModelWriter.conv_options(Padding.SAME, (1, 1), Act.NONE)
    fields += [(4, "i32", 2), (5, "i32", 2)]  # dilation_w/h_factor
    _assert_rejected(_conv_model(conv_fields=fields), tmp_path, "dilation")


def test_reject_dilated_dwconv(tmp_path):
    fields = ModelWriter.dwconv_options(Padding.SAME, (1, 1), 2, Act.NONE)
    fields += [(5, "i32", 1), (6, "i32", 3)]  # dilation_w/h_factor
    _assert_rejected(_conv_model(dw_fields=fields, dw_in_c=2), tmp_path,
                     "dilation")


def test_reject_fc_keep_num_dims(tmp_path):
    fields = ModelWriter.fc_options(Act.NONE) + [(2, "u8", 1)]
    _assert_rejected(_conv_model(fc_fields=fields), tmp_path, "keep_num_dims")


def test_reject_multi_subgraph(tmp_path):
    _assert_rejected(_conv_model(num_subgraphs=2), tmp_path, "subgraph")


def test_reject_multi_input(tmp_path):
    _assert_rejected(_conv_model(extra_input=True), tmp_path, "inputs")


def test_reject_multi_output(tmp_path):
    _assert_rejected(_conv_model(extra_output=True), tmp_path, "outputs")


def test_reject_unknown_activation(tmp_path):
    # TANH (enum 4) decodes but has no integer kernel; SIGN_BIT likewise.
    fields = ModelWriter.conv_options(Padding.SAME, (1, 1), Act.TANH)
    _assert_rejected(_conv_model(conv_fields=fields), tmp_path,
                     "activation")


def test_reject_dw_depth_multiplier_mismatch(tmp_path):
    # in_c=2 with 4 weight channels: outside the supported fallback
    # (in_c == 1 stem or in_c == CH); the reference would silently read
    # channel 0 for channels >= in_c (src/ops/depthwise_conv_2d.rs:92-99).
    _assert_rejected(_conv_model(dw_in_c=2), tmp_path, "fallback")


def test_dw_stem_and_true_depthwise_still_parse(tmp_path):
    # guard: the two supported forms keep parsing after the rejection work
    for in_c, name in ((1, "stem"), (4, "true_dw")):
        data = _conv_model(dw_in_c=in_c)
        path = str(tmp_path / f"ok_{name}.tflite")
        with open(path, "wb") as f:
            f.write(data)
        g = parse(path, frontend="python")
        assert g.layers, name
