#!/usr/bin/env python
"""Host input-pipeline throughput: decode → resample → normalize → 10-s
clips/second from tar shards (SURVEY.md §7 hard part 4: the host must feed
the device's clips/sec appetite).

Builds synthetic 44.1 kHz wav shards in a temp dir (wav exercises the same
decode→Kaiser-resample→RMS-normalize path as flac; the native flac decoder
itself is benchmarked in tests/test_flac.py), streams them through
ShardAudioSource with the training worker count, and prints ONE JSON line.

Scaling note: throughput is bounded by cores × ~21 clips/s (one 44.1 k→16 k
polyphase resample costs ~48 ms); this dev machine has 1 core, so ~20 clips/s
here. Production TPU-VM hosts have hundreds of cores; the process-backed
worker pool scales linearly with them.
"""

import io
import json
import tarfile
import tempfile
import time
from pathlib import Path

import numpy as np


def build_shards(root: Path, n_shards: int = 4, clips_per_shard: int = 24,
                 sr: int = 44100, seconds: float = 10.0) -> str:
    from scipy.io import wavfile

    rng = np.random.default_rng(0)
    for s in range(n_shards):
        with tarfile.open(root / f"shard-{s:04d}.tar", "w") as tar:
            for i in range(clips_per_shard):
                wav = (0.1 * rng.standard_normal(int(sr * seconds)) * 32000).astype(
                    np.int16
                )
                buf = io.BytesIO()
                wavfile.write(buf, sr, wav)
                data = buf.getvalue()
                info = tarfile.TarInfo(name=f"clip_{s:04d}_{i:04d}.wav")
                info.size = len(data)
                tar.addfile(info, io.BytesIO(data))
    return str(root / f"shard-{{0000..{n_shards - 1:04d}}}.tar")


def main():
    from wavjepa_tpu.data.pipeline import ShardAudioSource

    with tempfile.TemporaryDirectory() as tmp:
        pattern = build_shards(Path(tmp))
        source = ShardAudioSource(pattern, target_sr=16000, num_workers=16).start()
        it = iter(source)
        # warm: fill the decode pipelines
        for _ in range(32):
            next(it)
        n = 256
        t0 = time.perf_counter()
        for _ in range(n):
            clip = next(it)
        dt = time.perf_counter() - t0
        source.stop()
        assert clip.shape == (1, 160000)
        clips_per_sec = n / dt
        print(
            json.dumps(
                {
                    "metric": "host_pipeline_clips_per_sec",
                    "value": round(clips_per_sec, 1),
                    "unit": "clips/s",
                    "vs_baseline": None,
                }
            )
        )


if __name__ == "__main__":
    main()
