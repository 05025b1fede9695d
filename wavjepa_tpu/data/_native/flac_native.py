"""ctypes bindings for the native FLAC decoder."""

from __future__ import annotations

import ctypes

import numpy as np

from wavjepa_tpu.data._native.build import build

_lib = ctypes.CDLL(str(build()))
_lib.wavjepa_flac_decode.restype = ctypes.c_int
_lib.wavjepa_flac_decode.argtypes = [
    ctypes.c_char_p,
    ctypes.c_size_t,
    ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
    ctypes.POINTER(ctypes.c_int32),
    ctypes.POINTER(ctypes.c_int64),
    ctypes.POINTER(ctypes.c_int32),
]
_lib.wavjepa_flac_free.argtypes = [ctypes.POINTER(ctypes.c_float)]

_ERRORS = {
    -1: "bad magic / missing STREAMINFO",
    -2: "unsupported stream parameters",
    -3: "corrupt frame",
    -4: "allocation failure",
}


def decode_flac(data: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes → ((C, T) float32, sample_rate)."""
    samples = ctypes.POINTER(ctypes.c_float)()
    channels = ctypes.c_int32()
    frames = ctypes.c_int64()
    rate = ctypes.c_int32()
    code = _lib.wavjepa_flac_decode(
        data, len(data),
        ctypes.byref(samples), ctypes.byref(channels),
        ctypes.byref(frames), ctypes.byref(rate),
    )
    if code != 0:
        raise ValueError(f"FLAC decode failed: {_ERRORS.get(code, code)}")
    try:
        n = channels.value * frames.value
        arr = np.ctypeslib.as_array(samples, shape=(n,)).copy()
    finally:
        _lib.wavjepa_flac_free(samples)
    return arr.reshape(channels.value, frames.value), rate.value


# re-export under the name flac.py expects
decode = decode_flac
