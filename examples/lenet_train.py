"""LeNet on-device integer training (reference ``examples/leNet_train.rs``:
``#[model("models/train/lenet.tflite", 2, "crossentropy", true)]``).

The reference repo does not check in its ``lenet.tflite``; we synthesize
an equivalent LeNet-style int8 CNN with the engine's own TFLite writer
and train its last layers on a toy 10-class problem.
"""

import os
import tempfile

import numpy as np

from microflow_tpu.models import synth
from microflow_tpu.train import compile_tflite_train

path = os.path.join(tempfile.gettempdir(), "lenet.tflite")
synth.write(path, synth.lenet())

model = compile_tflite_train(path, 2, "crossentropy", True, name="lenet")
rng = np.random.default_rng(0)
batch, lr, steps = 32, 0.05, 40

# toy task: class = brightest quadrant-ish pattern
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
    pred = np.asarray(model.predict(x)).argmax(1)
    return float((pred == cls).mean())


print(f"initial accuracy: {accuracy():.3f}")
for step in range(steps):
    x, labels, _ = make_batch(batch)
    model.predict_train(x, labels, lr)
    model.update_layers(batch, lr)
    if (step + 1) % 10 == 0:
        print(f"step {step+1}: accuracy {accuracy():.3f}")
