"""Tests for the quantize op, cosine similarity, checkpointing, and the
deep (conv/dwconv/avgpool backward) training path."""

import os

import jax.numpy as jnp
import numpy as np

from microflow_tpu import models
from microflow_tpu.ops.quantize_op import quantize_op
from microflow_tpu.utils import cosine_similarity, load_params, macs_per_inference, save_params


def test_quantize_op_requantizes():
    x = jnp.array([[-128, 0, 127]], jnp.int8)  # scale 0.5, zp 0
    y = quantize_op(x, in_scale=0.5, in_zp=0, out_scale=1.0, out_zp=10)
    # dequant: [-64, 0, 63.5] -> /1.0 + 10 -> [-54, 10, 74] (roundf 73.5 -> 74)
    assert np.array_equal(np.asarray(y), [[-54, 10, 74]])


def test_cosine_similarity():
    a = np.array([[1.0, 0.0], [1.0, 1.0]], np.float32)
    b = np.array([[1.0, 0.0], [1.0, -1.0]], np.float32)
    sim = np.asarray(cosine_similarity(a, b))
    assert np.allclose(sim, [1.0, 0.0], atol=1e-6)


def test_checkpoint_roundtrip(tmp_path):
    m = models.sine_trainable()
    rng = np.random.default_rng(0)
    xs = rng.uniform(0, 2 * np.pi, (64, 1)).astype(np.float32)
    m.predict_train(xs, m.quantize_target(xs / 4), 0.01)
    m.update_layers(64, 0.01)
    ref = np.asarray(m.predict(xs))
    path = os.path.join(tmp_path, "ckpt.npz")
    save_params(path, m.params)
    m2 = models.sine_trainable()
    m2.params = load_params(path)
    assert np.array_equal(np.asarray(m2.predict(xs)), ref)


def test_macs_count_person_detect():
    g = models.person_detect().graph
    # MobileNet-v1 0.25x @96x96: ~7.16 MMACs
    assert 6_000_000 < macs_per_inference(g) < 8_500_000


def test_person_detect_deep_training_smoke():
    """Exercises conv / dwconv / avgpool / reshape backward end to end."""
    m = models.person_detect_trainable(num_train_layers=6)
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (2, 96, 96, 1)).astype(np.float32)
    gt = np.full((2, 2), -128, np.int8)
    gt[:, 0] = 127
    out = m.predict_train(x, gt, 0.5)
    assert out.shape == (2, 2)
    m.update_layers(2, 0.5)
    # at least one trainable conv layer must have moved
    moved = 0
    for i in m.backward_indices:
        key = f"layer{i}"
        if key in m.grads and key in m.params:
            orig = m.graph.layers[i]
            w0 = getattr(orig, "filters", getattr(orig, "weights", None))
            if w0 is not None:
                moved += int((np.asarray(m.params[key]["weights"]) != w0).any())
    assert moved >= 1


def test_memory_artifact_checked_in():
    """analysis/data/memory.csv (scripts/memory.py) -- the TPU analog of
    the reference's analysis/memory plots: params (flash) + activation
    bytes + compiled peak-HBM per bundled model."""
    import csv
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "analysis", "data", "memory.csv")
    assert os.path.exists(path), "run scripts/memory.py"
    rows = list(csv.DictReader(open(path)))
    assert {r["model"] for r in rows} == {"sine", "speech", "person_detect"}
    for r in rows:
        assert int(r["params_bytes"]) > 0
        assert int(r["peak_hbm_bytes"]) >= int(r["args_hbm_bytes"])


def test_cached_executable_roundtrip(tmp_path):
    """Engine-level executable cache: compile-and-store, then load-and-run
    with identical results; keyed on the lowered HLO so a second process
    (or a relay session with drifted XLA compile options) still hits."""
    from microflow_tpu.utils import cached_executable

    def f(a, b):
        return (a @ b).sum(axis=1), a + 1

    a = jnp.arange(12, dtype=jnp.float32).reshape(3, 4)
    b = jnp.ones((4, 5), jnp.float32)
    c1 = cached_executable(f, a, b, name="t", path=str(tmp_path))
    y1, z1 = c1(a, b)
    entries = [e for e in os.listdir(tmp_path) if e.startswith("exe_t-")]
    c2 = cached_executable(f, a, b, name="t", path=str(tmp_path))
    y2, z2 = c2(a, b)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))
    if entries:  # backend supports executable serialization: c2 was a load
        assert len(entries) == 1


def test_cached_executable_entries_are_not_pickle(tmp_path):
    """Cache entries are length-prefixed blobs (payload + treedef
    protos), never pickle: a writable cache dir must not grant code
    execution to whoever can write it (round-3 advisor).  Entries in
    the old pickle format (no magic) fall back to a fresh compile."""
    from microflow_tpu.utils import cached_executable
    from microflow_tpu.utils.cache import _ENTRY_MAGIC

    def f(a):
        return a * 2 + 1

    a = jnp.arange(8, dtype=jnp.float32)
    c1 = cached_executable(f, a, name="np", path=str(tmp_path))
    entries = [e for e in os.listdir(tmp_path) if e.startswith("exe_np-")]
    if not entries:  # backend without executable serialization
        return
    fpath = os.path.join(tmp_path, entries[0])
    with open(fpath, "rb") as fh:
        data = fh.read()
    assert data.startswith(_ENTRY_MAGIC)
    assert b"pickle" not in data[:256]
    # corrupt / legacy-format entry: loader must recompile, not crash
    with open(fpath, "wb") as fh:
        fh.write(b"\x80\x04legacy-pickle-junk")
    c2 = cached_executable(f, a, name="np", path=str(tmp_path))
    np.testing.assert_array_equal(np.asarray(c1(a)), np.asarray(c2(a)))


def test_model_warm_dispatch(tmp_path, monkeypatch):
    """CompiledModel.warm(b): predict at batch b routes through the
    warmed (and disk-cached) executable with bit-identical results."""
    from microflow_tpu import compile_tflite

    monkeypatch.setenv("MFT_CACHE_DIR", str(tmp_path))
    m = compile_tflite("models/sine.tflite")
    x = np.linspace(-1, 1, 4, dtype=np.float32).reshape(4, 1)
    base = np.asarray(m.predict(x))
    m.warm(4)
    assert 4 in m._warmed
    warmed = np.asarray(m.predict(x))
    np.testing.assert_array_equal(base, warmed)
    # other batch sizes still dispatch through the plain jit
    np.testing.assert_allclose(np.asarray(m.predict(x[:2])), base[:2])
    # a second model instance loads the persisted executable (when the
    # backend supports serialization) and agrees bit-for-bit
    m2 = compile_tflite("models/sine.tflite")
    m2.warm(4)
    np.testing.assert_array_equal(np.asarray(m2.predict(x)), base)


def test_serving_sweep_smoke(tmp_path, monkeypatch):
    """The opt-in serving sweep (scripts/analysis.py --serving) runs end
    to end on the virtual mesh and writes a well-formed serving_tunnel.csv
    (it is relay-bandwidth-bound on the TPU tunnel, so CI validates the
    harness on CPU; see docs/PERFORMANCE.md 'Serving end-to-end')."""
    import csv
    import sys

    monkeypatch.setenv("MFT_CACHE_DIR", str(tmp_path))
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    try:
        import analysis
    finally:
        sys.path.pop(0)
    monkeypatch.setattr(analysis, "OUT", str(tmp_path))
    analysis.serving_sweep(cases=[("sine", (1,), 64, 4)])
    with open(os.path.join(str(tmp_path), "serving_tunnel.csv")) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 1 and rows[0]["model"] == "sine"
    assert float(rows[0]["inferences_per_s"]) > 0
