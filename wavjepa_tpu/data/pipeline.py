"""Host-side training input pipeline: shards → decoded, resampled,
level-normalized 10-s clips → shuffled batches.

Reference counterpart: /root/reference/data_modules/WebAudioDataModule.py
(16 worker processes running decode → Kaiser sinc resample → RMS −14 dBFS →
pad/trim 10 s → *mask precomputation*). Differences by design:

  * masks are NOT precomputed here — they're sampled on-device inside the
    jitted train step (wavjepa_tpu/masking), removing the reference's
    dominant CPU cost and its mask/crop misalignment footgun;
  * worker processes by default (scipy's polyphase resampler holds the
    GIL — a threaded pipeline measured single-worker throughput), with a
    thread backend for tests/small runs;
  * shard→(host, worker) assignment is deterministic
    (data/shards.split_shards), reproducing split_by_node semantics for
    multi-host runs;
  * corrupt samples/shards are skipped with a warning
    (wds.warn_and_continue equivalent).

Weighted mixing of several shard lists (the reference's RandomMix) is
supported by assigning workers to sources proportionally to
``mixing_weights`` and drawing batch elements from a shared queue.
"""

from __future__ import annotations

import multiprocessing as mp
import queue
import threading
from typing import Iterator, Optional, Sequence

import numpy as np

from wavjepa_tpu.data.decode import decode_audio
from wavjepa_tpu.data.resample import resample_np
from wavjepa_tpu.data.shards import (
    expand_shard_pattern,
    iter_shard_samples,
    split_shards,
)


def preprocess_clip(
    wav: np.ndarray, target_sr: int, target_seconds: float = 10.0,
    target_dbfs: float = -14.0,
) -> np.ndarray:
    """RMS-normalize to −14 dBFS, zero-pad/trim to 10 s (reference
    dataset_functions.pre_process)."""
    rms = float(np.sqrt(np.mean(np.square(wav))))
    if rms > 0:
        wav = wav * 10.0 ** ((target_dbfs - 20.0 * np.log10(rms)) / 20.0)
    target_len = int(target_sr * target_seconds)
    t = wav.shape[-1]
    if t < target_len:
        wav = np.pad(wav, ((0, 0), (0, target_len - t)))
    elif t > target_len:
        wav = wav[:, :target_len]
    return wav.astype(np.float32)


def quantize_clip_int16(clip: np.ndarray) -> np.ndarray:
    """Peak-normalize and quantize a preprocessed clip to int16 for the
    host→device wire (4× fewer bytes than f32).

    Exactness: the train step instance-normalizes every crop over (C, T)
    (train/step.py), which removes any per-clip scalar gain — so the peak
    gain applied here is mathematically invisible, and the residual is pure
    int16 quantization noise at −96 dBFS, 48 dB BELOW the bf16 cast the
    reference itself applies to crops (jepa.py:275-316 precision='bf16').
    Measured motivation: the axon host→device path sustains ~40 MB/s, so a
    32-clip f32 batch costs ~490 ms — as long as the whole 500 ms train
    step (PERF.md round 4)."""
    peak = float(np.max(np.abs(clip))) if clip.size else 0.0
    if peak <= 0:
        return np.zeros(clip.shape, np.int16)
    return np.round(clip * (32767.0 / peak)).astype(np.int16)


def _audio_worker(
    shards, target_sr, target_seconds, seed, out_queue, stop_event,
    transfer_dtype="float32",
):
    """Top-level worker body (picklable for the spawn mp context):
    decode → resample → normalize → pad/trim → enqueue."""
    rng = np.random.default_rng(seed)
    shards = list(shards)
    rng.shuffle(shards)
    for key, sample in iter_shard_samples(shards, repeat=True):
        if stop_event.is_set():
            return
        try:
            wav, sr_in = decode_audio(sample)
            wav = wav[:1]  # mono-ize: first channel (reference
            # WebAudioDataModule._retrieve_sample takes audio[0])
            if sr_in is not None and sr_in != target_sr:
                wav = resample_np(wav, sr_in, target_sr)
            clip = preprocess_clip(wav, target_sr, target_seconds)
            if transfer_dtype == "int16":
                clip = quantize_clip_int16(clip)
        except Exception as exc:  # warn_and_continue
            print(f"[data] skipping sample {key}: {exc}", flush=True)
            continue
        while not stop_event.is_set():
            try:
                out_queue.put(clip, timeout=1.0)
                break
            except queue.Full:
                continue


class ShardAudioSource:
    """Sample producer over tar shards (worker processes by default)."""

    def __init__(
        self,
        patterns: Sequence[str] | str,
        target_sr: int = 16000,
        target_seconds: float = 10.0,
        mixing_weights: Optional[Sequence[float]] = None,
        num_workers: int = 16,
        queue_size: int = 512,
        host_id: int = 0,
        num_hosts: int = 1,
        seed: int = 0,
        backend: str = "process",  # "process" | "thread"
        transfer_dtype: str = "float32",  # "float32" | "int16" (see
        # quantize_clip_int16 — exact under the step's per-crop instance norm)
    ):
        if isinstance(patterns, str):
            patterns = [patterns]
        self.sources = [expand_shard_pattern(p) for p in patterns]
        self.target_sr = target_sr
        self.target_seconds = target_seconds
        self.transfer_dtype = transfer_dtype
        self.backend = backend
        if backend == "process":
            # spawn, not fork: the training drivers initialize JAX (which is
            # multithreaded) before building the data source, and forking a
            # multithreaded process can deadlock. Workers re-import the
            # package; sources are constructed picklable for this.
            self._ctx = mp.get_context("spawn")
            self.queue = self._ctx.Queue(maxsize=queue_size)
            self._stop = self._ctx.Event()
        else:
            self.queue = queue.Queue(maxsize=queue_size)
            self._stop = threading.Event()
        self.num_workers = max(1, num_workers)
        self.host_id, self.num_hosts = host_id, num_hosts
        self.seed = seed

        # workers per source ∝ mixing weight (RandomMix equivalent)
        if mixing_weights is None:
            mixing_weights = [1.0] * len(self.sources)
        w = np.asarray(mixing_weights, np.float64)
        w = w / w.sum()
        counts = np.maximum(1, np.round(w * self.num_workers).astype(int))
        self._threads = []
        wid = 0
        for src_idx, n in enumerate(counts):
            for k in range(int(n)):
                # stripe each source over ITS OWN workers (k of n): striping
                # by the global worker id against the global count would
                # leave every source's shards at the other sources' stripe
                # indices unread — silent data loss under RandomMix
                shards = split_shards(
                    self.sources[src_idx], self.host_id, self.num_hosts,
                    k, int(n),
                ) or list(self.sources[src_idx])
                args = (
                    shards, self.target_sr, self.target_seconds,
                    self.seed + wid, self.queue, self._stop,
                    self.transfer_dtype,
                )
                if backend == "process":
                    t = self._ctx.Process(target=_audio_worker, args=args, daemon=True)
                else:
                    t = threading.Thread(target=_audio_worker, args=args, daemon=True)
                self._threads.append(t)
                wid += 1

    def start(self):
        for t in self._threads:
            t.start()
        return self

    def stop(self):
        self._stop.set()
        if self.backend == "process":
            for t in self._threads:
                t.join(timeout=2.0)
                if t.is_alive():
                    t.terminate()

    def __iter__(self):
        # bounded get: a consumer parked in a timeout-less get() could never
        # observe stop() (the producers are gone, nothing will ever arrive)
        while not self._stop.is_set():
            try:
                yield self.queue.get(timeout=1.0)
            except queue.Empty:
                continue


def shuffled_batches(
    sample_iter: Iterator[np.ndarray],
    batch_size: int,
    shuffle_buffer: int = 1000,
    seed: int = 0,
) -> Iterator[np.ndarray]:
    """WebDataset-style streaming shuffle: a bounded buffer from which each
    emitted sample is a uniformly random eviction."""
    rng = np.random.default_rng(seed)
    buf: list[np.ndarray] = []
    it = iter(sample_iter)
    while len(buf) < shuffle_buffer:
        buf.append(next(it))
    while True:
        batch = []
        for _ in range(batch_size):
            j = int(rng.integers(len(buf)))
            batch.append(buf[j])
            buf[j] = next(it)
        yield np.stack(batch)


def audio_shard_batches(cfg) -> Iterator[np.ndarray]:
    """Config-driven SSL input pipeline → (B, 1, sr·10) batches
    (f32, or int16 wire format when cfg.data.transfer_dtype='int16')."""
    import jax

    source = ShardAudioSource(
        cfg.data.data_dirs,
        target_sr=cfg.data.sr,
        target_seconds=cfg.data.target_seconds,
        mixing_weights=cfg.data.mixing_weights,
        num_workers=cfg.data.num_workers,
        host_id=jax.process_index(),
        num_hosts=jax.process_count(),
        seed=cfg.trainer.seed,
        transfer_dtype=getattr(cfg.data, "transfer_dtype", "float32"),
    ).start()
    return shuffled_batches(
        iter(source),
        cfg.trainer.batch_size,
        shuffle_buffer=cfg.data.shuffle_buffer,
        seed=cfg.trainer.seed,
    )
