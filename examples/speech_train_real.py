"""Keyword-spotter fine-tuning on the REAL yes/no features (reference
``examples/speech_train.rs:48-93``: validation split + accuracy loop;
same train config -- 2 trainable layers, crossentropy, softmax excluded
from backward, lr 0.01-class schedule).

The reference trains on .npy spectrogram datasets it does not ship; the
real data we *do* have are its checked-in wav-derived feature tensors
(``samples/features.npz``, imported from the reference's
``samples/features/speech.rs``).  This demo
1. degrades the trainable suffix (fresh task head -- the pretrained
   model already classifies both samples),
2. rebuilds a dataset from the real yes/no features + int8-jitter
   augmentation + synthesized silence/unknown distractors,
3. fine-tunes with the integer training engine and reports accuracy on
   the REAL untouched features before/after, plus a held-out jittered
   validation split.
"""

import numpy as np

from microflow_tpu import models, samples

rng = np.random.default_rng(0)
model = models.speech_trainable()
feats = samples.load_features()
real = {"yes": feats["speech_yes"][0], "no": feats["speech_no"][0]}  # (1960,) int8
LABELS = samples.SPEECH_LABELS  # (silence, unknown, yes, no)
N = len(LABELS)


def jitter(x, amp=6):
    noise = rng.integers(-amp, amp + 1, x.shape)
    return np.clip(x.astype(np.int16) + noise, -128, 127).astype(np.int8)


def make_batch(batch=32):
    """Half real-feature jitters (yes/no), half synthesized distractors
    (silence = low-energy floor, unknown = broadband noise)."""
    xs, ys = [], []
    for _ in range(batch):
        c = rng.integers(0, N)
        if c == 0:  # silence
            x = rng.integers(-128, -120, 1960).astype(np.int8)
        elif c == 1:  # unknown
            x = rng.integers(-128, 128, 1960, dtype=np.int16).astype(np.int8)
        else:
            x = jitter(real[LABELS[c]])
        xs.append(x)
        ys.append(c)
    gt = np.full((batch, N), -128, np.int8)
    gt[np.arange(batch), ys] = 127
    return np.stack(xs), gt, np.array(ys)


def accuracy(xq, labels):
    probs = np.asarray(model.predict_quantized(xq))
    return float((probs.argmax(1) == labels).mean())


def real_report():
    xq = np.stack([real["yes"], real["no"]])
    probs = np.asarray(model.predict_quantized(xq))
    ok = int(probs[0].argmax() == 2) + int(probs[1].argmax() == 3)
    return ok, [LABELS[int(p.argmax())] for p in probs]


# --- degrade the task head (fresh 4-way classifier) -----------------
import jax.numpy as jnp

head = f"layer{model.train_indices[0]}"
w = np.asarray(model.params[head]["weights"])
model.params[head]["weights"] = jnp.asarray(
    rng.integers(-2, 3, w.shape).astype(w.dtype))

val_x, val_gt, val_y = make_batch(64)
print(f"after head reset: real-sample correct {real_report()[0]}/2, "
      f"val accuracy {accuracy(val_x, val_y):.2f}")

batch, lr, steps = 32, 0.05, 40
for step in range(steps):
    xq, gt, _ = make_batch(batch)
    model.predict_quantized_train(xq, gt, lr)
    model.update_layers(batch, lr)
    if (step + 1) % 10 == 0:
        ok, preds = real_report()
        print(f"step {step + 1}: val accuracy {accuracy(val_x, val_y):.2f}, "
              f"real yes/no -> {preds} ({ok}/2 correct)")

ok, preds = real_report()
print(f"final: real yes.wav -> {preds[0]!r}, no.wav -> {preds[1]!r} "
      f"({ok}/2 correct); val accuracy {accuracy(val_x, val_y):.2f}")

# deployable artifact: the fine-tuned model back as a standard .tflite
import os as _os
out = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "speech_finetuned.tflite")
model.export(out)
print(f"exported fine-tuned model -> {out}")
