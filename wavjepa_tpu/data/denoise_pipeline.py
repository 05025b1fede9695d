"""Host-side input pipeline for Denoiser training: clean 32 kHz clips plus
raw noise/RIR side channels, assembled into fixed-shape batches.

Reference counterpart: /root/reference/data_modules/WebAudioDataModuleDenoiser.py
(WebDataset audio pipeline + NoiseDataManager/RIRDataManager side-channel
mp.Processes feeding queues; `_augment_sample` fades/places the noise and
ships raw (audio, source_rir, noise, noise_len, noise_start, noise_rirs, snr)
tuples — the actual convolution happens later on the accelerator). Design
changes:

  * side channels are spawn-based worker PROCESSES over first-party tar
    readers (same rationale as the main ingest, data/pipeline.py:112-117:
    the numpy decode/fade path holds the GIL, and at real training rates
    threaded side channels contend with the audio workers' parent-side queue
    draining; spawn-not-fork because the drivers initialize JAX first). A
    thread backend remains for tests/small runs;
  * every emitted array is FIXED SHAPE: RIRs padded to ``rir_seconds``,
    noise-RIR count padded with zero rows to ``max_noise_sources`` (a zero
    RIR convolves to zero — same semantics as a missing source), noise
    shipped as a full-length placed buffer. This is what lets the entire
    scene synthesis live inside one jitted step (train/denoise_step.py).
"""

from __future__ import annotations

import multiprocessing as mp
import queue
import threading
from typing import Iterator, Optional, Sequence

import numpy as np

from wavjepa_tpu.data.decode import decode_audio
from wavjepa_tpu.data.pipeline import ShardAudioSource
from wavjepa_tpu.data.shards import expand_shard_pattern, iter_shard_samples


def _npy_side_worker(shards, seed, shuffle_buffer, out_queue, stop_event):
    """Top-level worker body (picklable for the spawn mp context): npy tar
    decode → streaming shuffle → enqueue."""
    rng = np.random.default_rng(seed)
    buf: list[np.ndarray] = []
    for _, sample in iter_shard_samples(list(shards), repeat=True):
        if stop_event.is_set():
            return
        try:
            arr, _ = decode_audio(sample)
        except Exception as exc:
            print(f"[data] skipping npy sample: {exc}", flush=True)
            continue
        if len(buf) < shuffle_buffer:
            buf.append(arr)
            continue
        # emit a random buffer slot, refill it with the new sample
        j = int(rng.integers(len(buf)))
        item, buf[j] = buf[j], arr
        while not stop_event.is_set():
            try:
                out_queue.put(item, timeout=1.0)
                break
            except queue.Full:
                continue


class NpySideSource:
    """Infinite loader over npy tar shards (reference NoiseDataManager /
    RIRDataManager, WebAudioDataModuleDenoiser.py:13-152) with a small
    streaming shuffle. Spawn processes by default (see module docstring)."""

    def __init__(
        self,
        pattern: str,
        num_workers: int = 1,
        queue_size: int = 500,
        shuffle_buffer: int = 100,
        seed: int = 0,
        backend: str = "process",  # "process" | "thread"
    ):
        self.shards = expand_shard_pattern(pattern)
        self.backend = backend
        if backend == "process":
            self._ctx = mp.get_context("spawn")
            self.queue = self._ctx.Queue(maxsize=queue_size)
            self._stop = self._ctx.Event()
        else:
            self._ctx = None
            self.queue = queue.Queue(maxsize=queue_size)
            self._stop = threading.Event()
        n = max(1, num_workers)
        self._threads = []
        for wid in range(n):
            shards = self.shards[wid::n] or self.shards
            args = (shards, seed + wid, shuffle_buffer, self.queue, self._stop)
            if backend == "process":
                self._threads.append(
                    self._ctx.Process(target=_npy_side_worker, args=args, daemon=True)
                )
            else:
                self._threads.append(
                    threading.Thread(target=_npy_side_worker, args=args, daemon=True)
                )

    def start(self):
        for t in self._threads:
            t.start()
        return self

    def stop(self):
        self._stop.set()

    def __next__(self) -> np.ndarray:
        while True:
            try:
                return self.queue.get(timeout=60.0)
            except queue.Empty:
                # reference retries forever on an empty queue
                # (WebAudioDataModuleDenoiser.py:61-67)
                if self._stop.is_set():
                    raise StopIteration
                print("[data] side-channel queue empty, retrying", flush=True)

    def __iter__(self):
        return self


def fade_noise(
    noise: np.ndarray, audio_len: int, sr: int, rng: np.random.Generator,
    fade_seconds: float = 0.2,
) -> np.ndarray:
    """Crop-or-fade the noise against the clip length (reference
    generate_scenes.fade_noise): longer noise → random crop + fade-out;
    shorter/equal → fade-in + fade-out."""
    n = int(sr * fade_seconds)
    noise = noise.astype(np.float32)
    if noise.shape[-1] > audio_len:
        start = int(rng.integers(0, noise.shape[-1] - audio_len))
        noise = noise[..., start : start + audio_len].copy()
        ramp_out = np.linspace(1.0, 0.0, min(n, noise.shape[-1]), dtype=np.float32)
        noise[..., -ramp_out.size :] *= ramp_out
    else:
        noise = noise.copy()
        ramp_in = np.linspace(0.0, 1.0, min(n, noise.shape[-1]), dtype=np.float32)
        ramp_out = ramp_in[::-1]
        noise[..., : ramp_in.size] *= ramp_in
        noise[..., -ramp_out.size :] *= ramp_out
    return noise


def _rms_normalize(wav: np.ndarray, target_dbfs: float = -14.0) -> np.ndarray:
    rms = float(np.sqrt(np.mean(np.square(wav))))
    if rms > 0:
        wav = wav * 10.0 ** ((target_dbfs - 20.0 * np.log10(rms)) / 20.0)
    return wav.astype(np.float32)


def _pad_or_trim(arr: np.ndarray, length: int) -> np.ndarray:
    t = arr.shape[-1]
    if t >= length:
        return arr[..., :length]
    pads = [(0, 0)] * (arr.ndim - 1) + [(0, length - t)]
    return np.pad(arr, pads)


class DenoiseSampleSource:
    """Joins the clean-audio stream with the noise/RIR side channels and
    emits fixed-shape sample dicts (reference `_augment_sample`,
    WebAudioDataModuleDenoiser.py:197-244)."""

    def __init__(
        self,
        data_pattern: str | Sequence[str],
        rir_pattern: Optional[str] = None,
        noise_pattern: Optional[str] = None,
        sr: int = 32000,
        target_seconds: float = 10.0,
        snr_low: float = -5.0,
        snr_high: float = 5.0,
        max_noise_sources: int = 5,
        rir_seconds: float = 2.0,
        num_workers: int = 16,
        host_id: int = 0,
        num_hosts: int = 1,
        seed: int = 0,
        backend: str = "process",
    ):
        self.sr = sr
        self.clip_len = int(sr * target_seconds)
        self.rir_len = int(sr * rir_seconds)
        self.max_noise = max_noise_sources
        self.snr_low, self.snr_high = snr_low, snr_high
        self.with_rir = rir_pattern is not None
        self.with_noise = noise_pattern is not None
        self.rng = np.random.default_rng(seed + 7919 * host_id)

        self.audio = ShardAudioSource(
            data_pattern,
            target_sr=sr,
            target_seconds=target_seconds,
            num_workers=num_workers,
            host_id=host_id,
            num_hosts=num_hosts,
            seed=seed,
            backend=backend,
        ).start()
        self.rirs = (
            NpySideSource(
                rir_pattern, num_workers=4, seed=seed + 1, backend=backend
            ).start()
            if self.with_rir
            else None
        )
        self.noise = (
            NpySideSource(
                noise_pattern, num_workers=1, seed=seed + 2, backend=backend
            ).start()
            if self.with_noise
            else None
        )

    def stop(self):
        self.audio.stop()
        if self.rirs:
            self.rirs.stop()
        if self.noise:
            self.noise.stop()

    def _prep_rir(self, rir: np.ndarray) -> np.ndarray:
        """(C, L) or (L,) → (C, rir_len)."""
        if rir.ndim == 1:
            rir = rir[None, :]
        return _pad_or_trim(rir.astype(np.float32), self.rir_len)

    def __iter__(self) -> Iterator[dict[str, np.ndarray]]:
        for clip in self.audio:  # (1, clip_len) f32, −14 dBFS, 10 s
            sample: dict[str, np.ndarray] = {
                "audio": clip[0].astype(np.float32)  # (T32,)
            }
            rir_stack = None
            if self.with_rir:
                rir_stack = next(self.rirs)  # (n_rirs, [C,] L)
                if rir_stack.ndim == 2:
                    rir_stack = rir_stack[:, None, :]
                sample["source_rir"] = self._prep_rir(rir_stack[0])
            if self.with_noise:
                raw = next(self.noise)
                raw = _rms_normalize(np.ravel(raw))
                faded = fade_noise(raw, self.clip_len, self.sr, self.rng)
                n_len = faded.shape[-1]
                start = 0
                placed = np.zeros((self.clip_len,), np.float32)
                if self.clip_len > n_len:
                    start = int(self.rng.integers(0, self.clip_len - n_len))
                placed[start : start + n_len] = faded[:self.clip_len]
                sample["noise"] = placed
                sample["noise_start"] = np.int32(start)
                sample["noise_length"] = np.int32(n_len)
                sample["snr"] = np.float32(
                    self.rng.uniform(self.snr_low, self.snr_high)
                )
                if self.with_rir:
                    nr = rir_stack[1 : 1 + self.max_noise]
                    nr = np.stack([self._prep_rir(r) for r in nr]) if len(nr) else (
                        np.zeros((0, 1, self.rir_len), np.float32)
                    )
                    pad = self.max_noise - nr.shape[0]
                    if pad > 0:
                        nr = np.concatenate(
                            [nr, np.zeros((pad,) + nr.shape[1:], np.float32)]
                        )
                    sample["noise_rirs"] = nr  # (max_noise, C, rir_len)
            yield sample


def denoise_batches(
    source: DenoiseSampleSource, batch_size: int
) -> Iterator[dict[str, np.ndarray]]:
    """Stack sample dicts into fixed-shape batch dicts."""
    it = iter(source)
    while True:
        samples = [next(it) for _ in range(batch_size)]
        yield {
            k: np.stack([s[k] for s in samples]) for k in samples[0]
        }
