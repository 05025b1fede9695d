"""Profiling hooks: jax.profiler traces + wall-clock block timing.

TPU counterpart of the reference's observability surface — the pynvml GPU
max-memory sampler (/root/reference/hear-eval-kit/heareval/gpu_max_mem.py:
10-62), Lightning's `profiler="simple"` and torchinfo summaries
(task_predictions.py:218,1027). Here: XLA-level traces viewable in
TensorBoard/Perfetto, device memory stats, and a lightweight section timer.

Usage:
    with trace("runs/profile"):           # captures an xplane trace
        state, m = train_step(state, batch, key)

    with timed("step") as t: ...
    print(t.elapsed_ms)
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: str, host_tracer_level: int = 2) -> Iterator[None]:
    """Capture a jax.profiler trace (xplane) into ``log_dir``."""
    import jax

    jax.profiler.start_trace(log_dir, create_perfetto_trace=True)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class _Timer:
    def __init__(self, name: str):
        self.name = name
        self.elapsed_ms: Optional[float] = None


@contextlib.contextmanager
def timed(name: str, sync: bool = True, verbose: bool = True) -> Iterator[_Timer]:
    """Wall-clock a block; blocks on outstanding device work first when
    ``sync`` so the measurement covers the real device time."""
    timer = _Timer(name)
    if sync:
        try:
            import jax

            jax.effects_barrier()
        except Exception:
            pass
    t0 = time.perf_counter()
    try:
        yield timer
    finally:
        if sync:
            try:
                import jax

                jax.effects_barrier()
            except Exception:
                pass
        timer.elapsed_ms = 1000.0 * (time.perf_counter() - t0)
        if verbose:
            print(f"[timed] {name}: {timer.elapsed_ms:.2f} ms", flush=True)


def device_memory_stats() -> dict:
    """Per-device memory stats (peak/in-use bytes) — replaces the pynvml
    sampler."""
    import jax

    stats = {}
    for device in jax.local_devices():
        s = device.memory_stats()
        if s:
            stats[str(device)] = {
                "bytes_in_use": s.get("bytes_in_use"),
                "peak_bytes_in_use": s.get("peak_bytes_in_use"),
                "bytes_limit": s.get("bytes_limit"),
            }
    return stats
