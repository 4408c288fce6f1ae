#!/usr/bin/env python
"""Import the reference's real-sample data into ``samples/features.npz``.

The reference demonstrates *real classification*: ``samples/yes.wav`` /
``no.wav`` (speech) and ``person.bmp`` / ``no_person.bmp`` (person
detection), with precomputed int8 feature tensors checked in as Rust
constants (``/root/reference/samples/features/speech.rs:1`` --
``YES/NO: Buffer2D<i8,1,1960>``; ``person_detect.rs:1`` --
``PERSON/NO_PERSON: Buffer4D<i8,1,96,96,1>``).  This script parses those
data constants into numpy arrays and writes them to
``samples/features.npz`` (checked in), plus decodes the BMPs
independently to cross-check the image features (pixel - 128).

The wav -> MFCC-like int8 feature extraction is the TFLM micro_speech
audio frontend, which ran offline in the reference too -- the checked-in
int8 features ARE the reference artifact; we import them as data.

Run: ``python scripts/import_samples.py /root/reference/samples``.
"""

import os
import re
import sys

import numpy as np

ROOT = os.path.normpath(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, ROOT)

from microflow_tpu.samples import decode_bmp_gray8  # noqa: E402


def parse_rust_int_matrix(text: str, name: str) -> np.ndarray:
    """Extract every integer from ``pub const NAME ... = <literal>``.

    nalgebra's ``matrix![..;..]`` uses ``;`` as ROW separator, so the
    span runs to the next ``pub const`` (or EOF), not the next ``;``;
    the type annotation before ``=`` is dropped so its const-generic
    dimensions don't leak into the data."""
    m = re.search(rf"pub const {name}\b[^=]*=(.*?)(?=pub const|\Z)", text, re.S)
    if m is None:
        raise ValueError(f"constant {name} not found")
    vals = re.findall(r"-?\d+", m.group(1))
    return np.array([int(v) for v in vals], np.int8)


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/samples"
    feats = {}

    speech_rs = open(os.path.join(src, "features", "speech.rs")).read()
    for name in ("YES", "NO"):
        arr = parse_rust_int_matrix(speech_rs, name)
        assert arr.shape == (1960,), arr.shape
        feats[f"speech_{name.lower()}"] = arr.reshape(1, 1960)

    pd_rs = open(os.path.join(src, "features", "person_detect.rs")).read()
    for name in ("PERSON", "NO_PERSON"):
        arr = parse_rust_int_matrix(pd_rs, name)
        assert arr.shape == (96 * 96,), arr.shape
        feats[f"person_detect_{name.lower()}"] = arr.reshape(1, 96, 96, 1)

    # cross-check the image features against an independent BMP decode:
    # the int8 feature is the 8-bit grayscale pixel REINTERPRETED as int8
    # (wrapping cast, the uint8-era int8 convention of this model)
    for name, bmp in (("person", "person.bmp"), ("no_person", "no_person.bmp")):
        img = decode_bmp_gray8(os.path.join(src, bmp))
        want = feats[f"person_detect_{name}"][0, :, :, 0]
        got = img.astype(np.int8)
        match = np.array_equal(got, want)
        print(f"{bmp}: decoded {img.shape}, int8-reinterpret == checked-in features: {match}")
        if not match:
            raise SystemExit(1)

    out = os.path.join(ROOT, "samples", "features.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(out, **feats)
    print(f"wrote {out}: " + ", ".join(f"{k}{v.shape}" for k, v in feats.items()))


if __name__ == "__main__":
    main()
