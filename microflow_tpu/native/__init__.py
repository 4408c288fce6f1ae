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
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
        i8p = np.ctypeslib.ndpointer(np.int8, flags="C")
        lib.mf_fold_fc.restype = None
        lib.mf_fold_fc.argtypes = [
            ctypes.c_float, ctypes.c_int32, ctypes.c_float, ctypes.c_int32,
            ctypes.c_float, ctypes.c_int64, ctypes.c_float,
            i32p, ctypes.c_int32, i8p, ctypes.c_int32,
            f32p, f32p, i32p, i32p,
        ]
        lib.mf_fold_conv.restype = None
        lib.mf_fold_conv.argtypes = [
            ctypes.c_float, ctypes.c_float,
            f32p, ctypes.c_int32, f32p, ctypes.c_int32, i64p, ctypes.c_int32,
            i32p, ctypes.c_int32, f32p, f32p,
        ]
        lib.mf_fold_avgpool.restype = None
        lib.mf_fold_avgpool.argtypes = [
            ctypes.c_float, ctypes.c_int32, ctypes.c_float, ctypes.c_int32,
            f32p, f32p,
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


def fold_fc(in_scale, in_zp, w_scale, w_zp, bias_scale, bias_zp, out_scale,
            bias: np.ndarray, weights_kn: np.ndarray):
    """Native FC constant folding -> (c0 f32[N], c1 f32, c2 i32[N], c3 i32)."""
    _ensure_built()
    if _lib is None:
        raise RuntimeError(f"native fold unavailable: {_build_error}")
    bias = np.ascontiguousarray(bias, np.int32)
    w = np.ascontiguousarray(weights_kn, np.int8)
    k, n = w.shape
    c0 = np.empty(n, np.float32)
    c1 = np.empty(1, np.float32)
    c2 = np.empty(n, np.int32)
    c3 = np.empty(1, np.int32)
    _lib.mf_fold_fc(
        np.float32(in_scale), int(in_zp), np.float32(w_scale), int(w_zp),
        np.float32(bias_scale), int(bias_zp), np.float32(out_scale),
        bias, n, w, k, c0, c1, c2, c3,
    )
    return c0, np.float32(c1[0]), c2, int(c3[0])


def fold_conv(in_scale, out_scale, w_scales, bias_scales, bias_zps,
              bias: np.ndarray, num_filters: int):
    """Native conv/dwconv folding -> (c0 f32[F], c1 f32[n_wq])."""
    _ensure_built()
    if _lib is None:
        raise RuntimeError(f"native fold unavailable: {_build_error}")
    ws = np.ascontiguousarray(w_scales, np.float32)
    bs = np.ascontiguousarray(bias_scales, np.float32)
    bz = np.ascontiguousarray(bias_zps, np.int64)
    bias = np.ascontiguousarray(bias, np.int32)
    c0 = np.empty(num_filters, np.float32)
    c1 = np.empty(len(ws), np.float32)
    _lib.mf_fold_conv(
        np.float32(in_scale), np.float32(out_scale),
        ws, len(ws), bs, len(bs), bz, len(bz), bias, num_filters, c0, c1,
    )
    return c0, c1


def fold_avgpool(in_scale, in_zp, out_scale, out_zp):
    """Native avgpool folding -> (c0 f32, c1 f32)."""
    _ensure_built()
    if _lib is None:
        raise RuntimeError(f"native fold unavailable: {_build_error}")
    c0 = np.empty(1, np.float32)
    c1 = np.empty(1, np.float32)
    _lib.mf_fold_avgpool(np.float32(in_scale), int(in_zp), np.float32(out_scale), int(out_zp), c0, c1)
    return np.float32(c0[0]), np.float32(c1[0])
