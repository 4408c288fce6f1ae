"""Speech (TinyConv) real-sample classification demo (reference
``examples/speech.rs``): classify the int8 spectrogram features of
``yes.wav`` and ``no.wav``."""

import numpy as np

from microflow_tpu import models
from microflow_tpu.samples import SPEECH_LABELS, load_features

model = models.speech()
golden_in, golden_out = models.GOLDENS["speech"]
out = np.asarray(model.predict(golden_in))
print("golden input ->", out[0].tolist(), "(expected", golden_out[0].tolist(), ")")

feats = load_features()
for wav, key in (("yes.wav", "speech_yes"), ("no.wav", "speech_no")):
    probs = np.asarray(model.predict_quantized(feats[key]))[0]
    print(f"\nInput sample: '{wav}'")
    print("Prediction: " + ", ".join(f"{p*100:.1f}% {l}" for l, p in zip(SPEECH_LABELS, probs)))
    print("Outcome:", SPEECH_LABELS[int(np.argmax(probs))].upper())
