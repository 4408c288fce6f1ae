"""Native (C++) components, bound via ctypes.

``tflite_parser.cpp`` is the native model front-end: it walks the
flatbuffer vtables in C++ and returns JSON metadata with byte offsets of
every weight payload, which Python maps zero-copy with numpy.  The build
is a single g++ invocation, cached next to the source; if no compiler is
available the pure-Python front-end is used transparently.
"""

from __future__ import annotations

import ctypes
import json
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "tflite_parser.cpp")
_SO = os.path.join(_DIR, "libmf_tflite.so")

_lib = None
_build_error: str | None = None


def _ensure_built():
    global _lib, _build_error
    if _lib is not None or _build_error is not None:
        return
    try:
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(_SO)
        lib.mf_parse_tflite.restype = ctypes.c_int
        lib.mf_parse_tflite.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.c_char_p,
            ctypes.c_size_t,
        ]
        _lib = lib
    except Exception as e:  # no compiler / load failure -> python fallback
        _build_error = str(e)


def available() -> bool:
    _ensure_built()
    return _lib is not None


def parse_metadata(buf: bytes) -> dict:
    """Parse a .tflite buffer with the native parser -> metadata dict."""
    _ensure_built()
    if _lib is None:
        raise RuntimeError(f"native parser unavailable: {_build_error}")
    cap = 1 << 20
    while True:
        out = ctypes.create_string_buffer(cap)
        rc = _lib.mf_parse_tflite(buf, len(buf), out, cap)
        if rc == -1:
            raise ValueError("native parser: invalid TFLite model")
        if rc < -1:
            cap = (-rc - 2) + 16
            continue
        return json.loads(out.value.decode("utf-8"))
