"""Sine inference demo (reference ``examples/sine.rs``)."""

import numpy as np

from microflow_tpu import models

model = models.sine()
xs = np.linspace(0, 2 * np.pi, 16, dtype=np.float32).reshape(-1, 1)
ys = np.asarray(model.predict(xs))
for x, y in zip(xs[:, 0], ys[:, 0]):
    print(f"sin({x:.3f}) ~= {y:+.4f} (true {np.sin(x):+.4f})")
