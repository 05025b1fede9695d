"""FLAC decoding: native C++ decoder with optional soundfile fallback.

AudioSet/LibriSpeech webdataset shards store `.flac` payloads
(/root/reference/data_modules/WebAudioDataModule.py:92 decodes them via
torchaudio). This build ships a first-party decoder:
`wavjepa_tpu/data/_native/flac_decoder.cc` (CPython-free C++ core, loaded
via ctypes), built on demand with g++ — no third-party audio libraries.
"""

from __future__ import annotations

import numpy as np


def decode(data: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes → ((C, T) float32 in [-1, 1], sample_rate)."""
    native = _load_native()
    if native is not None:
        return native.decode_flac(data)
    try:
        import soundfile as sf
        import io

        wav, sr = sf.read(io.BytesIO(data), dtype="float32", always_2d=True)
        return np.ascontiguousarray(wav.T), int(sr)
    except ImportError:
        pass
    raise RuntimeError(
        "FLAC decoding unavailable: native decoder failed to build and "
        "soundfile is not installed. Run "
        "`python -m wavjepa_tpu.data._native.build` to (re)build the "
        "native decoder."
    )


_NATIVE = None
_NATIVE_TRIED = False


def _load_native():
    global _NATIVE, _NATIVE_TRIED
    if not _NATIVE_TRIED:
        _NATIVE_TRIED = True
        try:
            from wavjepa_tpu.data._native import flac_native

            _NATIVE = flac_native
        except Exception as exc:
            print(f"[flac] native decoder unavailable: {exc}", flush=True)
            _NATIVE = None
    return _NATIVE
