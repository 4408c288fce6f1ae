"""person_detect training demo (reference ``examples/person_detect_train.rs``:
10 trainable layers, crossentropy, softmax excluded).  Exercises the
conv / depthwise-conv / average-pool backward kernels end to end on
synthetic data (the reference's dataset is not shipped in its repo).
"""

import numpy as np

from microflow_tpu import models

model = models.person_detect_trainable(num_train_layers=10)
rng = np.random.default_rng(0)
batch, lr = 8, 0.5


def make_batch():
    labels = rng.integers(0, 2, batch)
    x = rng.uniform(0, 1, (batch, 96, 96, 1)).astype(np.float32)
    x[labels == 1] *= 0.3  # darker images = "person", synthetically
    gt = np.full((batch, 2), -128, np.int8)
    gt[np.arange(batch), labels] = 127
    return x, gt


for step in range(3):
    x, gt = make_batch()
    out = model.predict_train(x, gt, lr)
    model.update_layers(batch, lr)
    print(f"step {step}: pre-softmax logits mean {np.asarray(out).mean():+.4f}")
print("trained layers:", model.backward_indices)
