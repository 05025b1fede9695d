"""Training metrics: console + TensorBoard logging, throughput counters.

TPU counterpart of the reference's TensorBoardLogger + LearningRateMonitor +
per-step log_dict (/root/reference/train.py:133-156, jepa.py:322-328). Adds
the clips/sec/chip counter that BASELINE.json uses as the north-star metric.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Optional


class MetricLogger:
    def __init__(self, log_dir: Optional[str] = None, use_tensorboard: bool = True):
        self.writer = None
        self.log_dir = log_dir
        if log_dir and use_tensorboard:
            try:
                from tensorboardX import SummaryWriter

                Path(log_dir).mkdir(parents=True, exist_ok=True)
                self.writer = SummaryWriter(log_dir)
            except Exception:
                self.writer = None
        self._jsonl = None
        if log_dir:
            Path(log_dir).mkdir(parents=True, exist_ok=True)
            self._jsonl = open(Path(log_dir) / "metrics.jsonl", "a")

    def log(self, step: int, metrics: dict):
        scalars = {k: float(v) for k, v in metrics.items()}
        if self.writer is not None:
            for key, value in scalars.items():
                self.writer.add_scalar(key, value, step)
        if self._jsonl is not None:
            self._jsonl.write(json.dumps({"step": step, **scalars}) + "\n")
            self._jsonl.flush()
        parts = " ".join(f"{k}={v:.5g}" for k, v in scalars.items())
        print(f"[step {step}] {parts}", flush=True)

    def close(self):
        if self.writer is not None:
            self.writer.close()
        if self._jsonl is not None:
            self._jsonl.close()


class Throughput:
    """clips/sec (and /chip) over a sliding window of steps."""

    def __init__(self, clips_per_step: int, n_chips: int):
        self.clips_per_step = clips_per_step
        self.n_chips = max(n_chips, 1)
        self._t0 = None
        self._steps = 0

    def start(self):
        self._t0 = time.perf_counter()
        self._steps = 0

    def step(self) -> dict:
        self._steps += 1
        elapsed = time.perf_counter() - self._t0
        cps = self.clips_per_step * self._steps / max(elapsed, 1e-9)
        return {
            "clips_per_sec": cps,
            "clips_per_sec_per_chip": cps / self.n_chips,
            "step_time_ms": 1000.0 * elapsed / self._steps,
        }
