"""Person-detection real-sample classification demo (reference
``examples/person_detect.rs``): classify the int8 image features of
``person.bmp`` and ``no_person.bmp``, then show batched serving."""

import numpy as np

from microflow_tpu import models
from microflow_tpu.samples import PERSON_DETECT_LABELS, load_features

model = models.person_detect()
golden_in, golden_out = models.GOLDENS["person_detect"]
out = np.asarray(model.predict(golden_in))
print("golden input ->", out, "(expected", golden_out[0].tolist(), ")")

feats = load_features()
for bmp, key in (("person.bmp", "person_detect_person"), ("no_person.bmp", "person_detect_no_person")):
    probs = np.asarray(model.predict_quantized(feats[key]))[0]
    print(f"\nInput sample: '{bmp}'")
    print("Prediction: " + ", ".join(f"{p*100:.1f}% {l}" for l, p in zip(PERSON_DETECT_LABELS, probs)))
    print("Outcome:", PERSON_DETECT_LABELS[int(np.argmax(probs))].upper())

batch = np.random.default_rng(0).uniform(0, 1, (32, 96, 96, 1)).astype(np.float32)
probs = np.asarray(model.predict(batch))
print(f"\nbatch of 32 random inputs: mean person-prob {probs[:, 1].mean():.3f}")
