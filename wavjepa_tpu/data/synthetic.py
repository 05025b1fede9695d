"""Synthetic waveform source: infinite random 10-s clip batches.

Used for smoke tests and the pretrain-throughput benchmark (bench.py) — the
model-side pipeline is identical to real data, only decode/resample is
skipped. Clips are pink-ish noise (cheap IIR over white noise) so instance
norms see realistic dynamic range rather than pure white noise.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np


def synthetic_audio_batches(
    batch_size: int,
    in_channels: int = 1,
    seconds: float = 10.0,
    sr: int = 16000,
    seed: int = 0,
    start_batch: int = 0,
) -> Iterator[np.ndarray]:
    """Batch i is a pure function of (seed, i) — keyed per index rather than
    RNG-sequential — so a resumed run can rebuild the exact stream position
    in O(1) via ``start_batch`` (train/loop.py resume; the reference cannot
    resume its SSL path at all, train.py)."""
    length = int(seconds * sr)
    i = start_batch
    while True:
        rng = np.random.default_rng((seed, i))
        i += 1
        # draw f32 directly: float64 generation is pathologically slow on
        # some hosts (measured ~70x; it made TPU smoke runs host-bound)
        white = rng.standard_normal(
            (batch_size, in_channels, length), dtype=np.float32
        )
        # one-pole lowpass to give a decaying spectrum
        batch = white.copy()
        batch[..., 1:] = 0.7 * white[..., :-1] + 0.3 * white[..., 1:]
        yield batch
