"""Shared measurement protocol for the bench_*.py drivers.

ONE canonical home for the two subtleties every bench must get right:

1. **Timing closure.** `block_until_ready` does NOT reliably block through
   the tunneled/remote TPU backend (measured 100x-inflated rates with it).
   Timings close with a HOST VALUE FETCH (`float(metrics["loss"])`) of the
   LAST step's loss: it depends on the whole donated-state chain, so it
   forces every timed step to have executed.
2. **Serial chaining.** Each step consumes the previous step's (donated)
   state, so XLA cannot overlap or LICM-hoist iterations (the round-2
   measurement trap — PERF.md "Measurement traps").

bench_e2e.py keeps its own time-bounded fed loop (a different protocol by
design) but shares the baseline constant and `emit_record` so the JSON
schema stays in one place.
"""

from __future__ import annotations

import json
import math
import time

# The reference's SSL walltime floor: 375 k steps x 32 clips/GPU over the
# 66 h SLURM budget (BASELINE.md "Training / inference cost context").
BASELINE_CLIPS_PER_SEC_PER_CHIP = 50.5


def time_steps(run_step, iters: int = 20, warmup: int = 2):
    """Time `iters` serial train steps; returns (step_seconds, last_loss).

    `run_step()` must execute ONE step — rebinding its state so successive
    calls chain through the donated buffers — and return that step's
    metrics dict (with a scalar ``loss``). The first call compiles; timing
    starts after `warmup` further calls and is closed by the host fetch.
    """
    metrics = run_step()
    float(metrics["loss"])  # compile + settle
    for _ in range(warmup):
        metrics = run_step()
    float(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(iters):
        metrics = run_step()
    loss = float(metrics["loss"])  # closes the timing: forces all iters
    dt = time.perf_counter() - t0
    assert math.isfinite(loss), f"non-finite loss {loss}"
    return dt / iters, loss


def emit_record(
    metric: str,
    clips_per_sec_per_chip: float,
    baseline: float = BASELINE_CLIPS_PER_SEC_PER_CHIP,
    **extra,
) -> dict:
    """Print the driver-format ONE JSON line (metric/value/unit/vs_baseline
    core + any extra fields); returns the dict."""
    record = {
        "metric": metric,
        "value": round(clips_per_sec_per_chip, 2),
        "unit": "clips/s/chip",
        "vs_baseline": round(clips_per_sec_per_chip / baseline, 3),
        **extra,
    }
    print(json.dumps(record))
    return record


def emit(
    metric: str,
    clips_per_sec_per_chip: float,
    step_seconds: float,
    step_flops: float,
    baseline: float = BASELINE_CLIPS_PER_SEC_PER_CHIP,
    **extra,
) -> dict:
    """emit_record plus the per-step timing/FLOPs/MFU fields."""
    from wavjepa_tpu.utils.flops import mfu

    return emit_record(
        metric,
        clips_per_sec_per_chip,
        baseline,
        step_time_ms=round(1000 * step_seconds, 1),
        tflops_per_step=round(step_flops / 1e12, 2),
        mfu=round(mfu(step_flops, step_seconds), 4),
        **extra,
    )
