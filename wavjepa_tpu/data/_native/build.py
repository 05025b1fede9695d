"""Build the native data-plane library (g++ → shared object, ctypes-loaded).

Invoked automatically on first use, or manually:
    python -m wavjepa_tpu.data._native.build
"""

from __future__ import annotations

import subprocess
from pathlib import Path

HERE = Path(__file__).parent
SOURCES = [HERE / "flac_decoder.cc", HERE / "resampler.cc"]
LIB = HERE / "libwavjepa_native.so"


def build(force: bool = False) -> Path:
    if LIB.exists() and not force:
        newest_src = max(s.stat().st_mtime for s in SOURCES)
        if LIB.stat().st_mtime >= newest_src:
            return LIB
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-Wall",
        # fast-math + native ISA let the resampler's FMA reduction vectorize
        # (the lib is built on the machine that runs it); FLAC decoding is
        # integer-exact and unaffected
        "-ffast-math", "-march=native", "-funroll-loops",
        "-o", str(LIB), *[str(s) for s in SOURCES],
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return LIB


if __name__ == "__main__":
    path = build(force=True)
    print(f"built {path}")
