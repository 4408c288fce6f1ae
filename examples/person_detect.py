"""Person-detection inference demo (reference ``examples/person_detect.rs``).

The reference ships precomputed int8 image features; here we run the
golden all-0.5 input plus a random batch to show batched serving.
"""

import numpy as np

from microflow_tpu import models

model = models.person_detect()
golden_in, golden_out = models.GOLDENS["person_detect"]
out = np.asarray(model.predict(golden_in))
print("golden input ->", out, "(expected", golden_out[0].tolist(), ")")

batch = np.random.default_rng(0).uniform(0, 1, (32, 96, 96, 1)).astype(np.float32)
probs = np.asarray(model.predict(batch))
print(f"batch of 32: mean person-prob {probs[:, 0].mean():.3f}")
