"""Build the native data-plane library (g++ → shared object, ctypes-loaded).

Invoked automatically on first use, or manually:
    python -m wavjepa_tpu.data._native.build

The library is compiled with -march=native, so a prebuilt .so must never be
reused on a different machine (SIGILL in a dataloader worker is not
catchable). A sidecar .build.json records the compile flags, source mtimes
(including this file), and a CPU fingerprint; any mismatch triggers a
rebuild.
"""

from __future__ import annotations

import hashlib
import json
import subprocess
from pathlib import Path

HERE = Path(__file__).parent
SOURCES = [HERE / "flac_decoder.cc", HERE / "resampler.cc"]
LIB = HERE / "libwavjepa_native.so"
META = HERE / "libwavjepa_native.build.json"

FLAGS = [
    "-O3", "-std=c++17", "-shared", "-fPIC", "-Wall",
    # fast-math + native ISA let the resampler's FMA reduction vectorize
    # (the lib is only ever used on the machine that built it — see META);
    # FLAC decoding is integer-exact and unaffected
    "-ffast-math", "-march=native", "-funroll-loops",
]


def _cpu_fingerprint() -> str:
    """Identify the ISA this machine supports (model name + feature flags)."""
    try:
        text = Path("/proc/cpuinfo").read_text()
        lines = [
            line for line in text.splitlines()
            if line.startswith(("model name", "flags", "Features"))
        ]
        return hashlib.sha256("\n".join(sorted(set(lines))).encode()).hexdigest()
    except OSError:
        import platform

        return platform.machine()


def _build_signature() -> dict:
    return {
        "flags": FLAGS,
        "cpu": _cpu_fingerprint(),
        "sources": {
            s.name: s.stat().st_mtime for s in SOURCES + [Path(__file__)]
        },
    }


def build(force: bool = False) -> Path:
    want = _build_signature()
    if not force and LIB.exists() and META.exists():
        try:
            if json.loads(META.read_text()) == want:
                return LIB
        except (json.JSONDecodeError, OSError):
            pass
    cmd = ["g++", *FLAGS, "-o", str(LIB), *[str(s) for s in SOURCES]]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        # surface the compiler diagnostics — callers fall back to scipy and
        # would otherwise only print an opaque CalledProcessError repr
        raise RuntimeError(
            f"native build failed (exit {proc.returncode}): {' '.join(cmd)}\n"
            f"{proc.stderr.strip()}"
        )
    META.write_text(json.dumps(want))
    return LIB


if __name__ == "__main__":
    path = build(force=True)
    print(f"built {path}")
