"""On-device integer training demo (reference ``examples/sine_train.rs``):
retarget the sine model's last FC layer to approximate y = x / 4.

The reference runs 500 epochs x 1000 samples at batch 64 one sample at a
time; here each batch is a single TPU-friendly training-step call.

Pass ``--float`` to train on the reference's unquantized f32 gradient
twins instead of the integer path (gradient_mode="float"; the twins
live on the dequantized scale, so the natural lr is much larger).
"""

import sys

import numpy as np

from microflow_tpu import models

use_float = "--float" in sys.argv[1:]
model = models.sine_trainable(gradient_mode="float" if use_float else "quantized")
rng = np.random.default_rng(0)
epochs, steps_per_epoch, batch = 20, 16, 64
lr = 20.0 if use_float else 0.01


def eval_mse() -> float:
    xs = rng.uniform(0, 2 * np.pi, (512, 1)).astype(np.float32)
    return float(np.mean((np.asarray(model.predict(xs)) - xs / 4) ** 2))


print(f"initial mse vs x/4: {eval_mse():.4f}")
for epoch in range(epochs):
    for _ in range(steps_per_epoch):
        xs = rng.uniform(0, 2 * np.pi, (batch, 1)).astype(np.float32)
        model.predict_train(xs, model.quantize_target(xs / 4), lr)
        model.update_layers(batch, lr)
    print(f"epoch {epoch}: mse {eval_mse():.4f}")

print("final weights:", np.asarray(model.params[f"layer{model.backward_indices[0]}"]["weights"]).T)
