"""Keyword-spotter training demo (reference ``examples/speech_train.rs``:
2 trainable layers, crossentropy, softmax excluded from backward).

The reference loads .npy spectrogram datasets that are not shipped in its
repo; this demo trains on synthetic class-conditional noise to exercise
the full integer-backprop path end to end.
"""

import numpy as np

from microflow_tpu import models

model = models.speech_trainable()
rng = np.random.default_rng(0)
batch, lr, steps, n_classes = 32, 0.5, 30, 4


def make_batch():
    labels = rng.integers(0, n_classes, batch)
    x = rng.normal(0, 0.2, (batch, 1960)).astype(np.float32)
    for i, c in enumerate(labels):
        x[i, c * 490 : (c + 1) * 490] += 1.0  # class-dependent energy band
    gt = np.full((batch, n_classes), -128, np.int8)
    gt[np.arange(batch), labels] = 127
    return x, gt, labels


def accuracy() -> float:
    x, _, labels = make_batch()
    probs = np.asarray(model.predict(x))
    return float((probs.argmax(1) == labels).mean())


print(f"initial accuracy: {accuracy():.2f}")
for step in range(steps):
    x, gt, _ = make_batch()
    model.predict_train(x, gt, lr)
    model.update_layers(batch, lr)
    if (step + 1) % 10 == 0:
        print(f"step {step + 1}: accuracy {accuracy():.2f}")
