"""ctypes binding for the native polyphase resampler (resampler.cc)."""

from __future__ import annotations

import ctypes

import numpy as np

from wavjepa_tpu.data._native.build import build

_lib = ctypes.CDLL(str(build()))
_lib.wavjepa_resample_poly.restype = ctypes.c_int
_lib.wavjepa_resample_poly.argtypes = [
    np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
    ctypes.c_int64,
    ctypes.c_int64,
    np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
    ctypes.c_int64,
    ctypes.c_int64,
    ctypes.c_int64,
    np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
    ctypes.c_int64,
]


def resample_poly_native(
    x: np.ndarray, kernel: np.ndarray, L: int, M: int, t_out: int
) -> np.ndarray:
    """(rows, T) f32 × centered FIR kernel → (rows, t_out) f32; identical
    semantics to scipy.signal.resample_poly with this kernel."""
    x = np.ascontiguousarray(x, np.float32)
    kernel = np.ascontiguousarray(kernel, np.float32)
    rows, t_in = x.shape
    out = np.empty((rows, t_out), np.float32)
    code = _lib.wavjepa_resample_poly(
        x, rows, t_in, kernel, kernel.size, L, M, out, t_out
    )
    if code != 0:
        raise ValueError(f"native resample failed (code {code})")
    return out
