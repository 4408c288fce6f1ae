"""Speech (TinyConv) inference demo (reference ``examples/speech.rs``).

The reference feeds precomputed int8 spectrogram features of yes.wav /
no.wav; here we run the golden constant input plus random features.
"""

import numpy as np

from microflow_tpu import models

model = models.speech()
golden_in, golden_out = models.GOLDENS["speech"]
out = np.asarray(model.predict(golden_in))
print("golden input ->", out[0].tolist())
print("expected      ", golden_out[0].tolist())

labels = ["silence", "unknown", "yes", "no"]
x = np.random.default_rng(0).uniform(0, 1, (4, 1960)).astype(np.float32)
for row in np.asarray(model.predict(x)):
    print({l: round(float(p), 3) for l, p in zip(labels, row)})
