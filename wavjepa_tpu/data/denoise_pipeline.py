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
    WebAudioDataModuleDenoiser.py:197-244).

    Wire-cost options (VERDICT r4 #1 — the raw f32 tuple the reference ships
    to GPU, WebAudioDataModuleDenoiser.py:13-152, is ~4-5.6 MB/clip; on the
    ~40 MB/s axon link that is seconds of transfer per batch):

      * ``transfer_dtype='int16'`` quantizes audio AND noise per clip
        (data/pipeline.quantize_clip_int16). Both are 16-bit sources (FLAC
        audio, WHAM noise); the per-clip peak gain cancels exactly on device
        — per-crop instance norm for the source, the segmental-SNR
        renormalization for the noise (ops/scenes.wire_to_f32).
      * ``rir_bank_size=N`` pre-pulls N RIR stacks into a host bank the
        training loop ships to the device ONCE (`scene_bank()`); samples then
        carry a 4-byte ``rir_index`` instead of ~0.5-3 MB of f32 RIRs.
        ``next_bank_refresh(k)`` streams k fresh stacks per batch into
        ring-buffer slots so a long run still tracks the side-channel
        distribution (at batch 32 / k=1 each stack serves ~32·N/N = 32
        clips before eviction, vs 1 in the reference's ship-every-clip).
      * ``noise_bank_size=N`` does the same for the noise bed: bank rows
        store the FADED noise (fade_noise output, left-aligned, zero-padded
        to clip_len) so per-use placement is a pure on-device shift
        (ops/scenes.place_noise_from_bank); samples carry ``noise_index`` +
        ``noise_start`` instead of the 0.6-1.3 MB placed buffer. The
        per-use randomness that survives is the placement offset and the
        SNR (the crop/fade freezes per bank row until its ring refresh —
        same trade as the RIR bank).
    """

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
        transfer_dtype: str = "float32",  # "float32" | "int16"
        rir_bank_size: int = 0,  # 0 = ship RIRs inline with every sample
        noise_bank_size: int = 0,  # 0 = ship the placed noise buffer inline
    ):
        self.sr = sr
        self.clip_len = int(sr * target_seconds)
        self.rir_len = int(sr * rir_seconds)
        self.max_noise = max_noise_sources
        self.snr_low, self.snr_high = snr_low, snr_high
        self.with_rir = rir_pattern is not None
        self.with_noise = noise_pattern is not None
        self.transfer_dtype = transfer_dtype
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
        self._bank: Optional[dict[str, np.ndarray]] = None
        self._bank_ptr = 0
        if self.with_rir and rir_bank_size > 0:
            self._build_bank(rir_bank_size)
        self._noise_bank: Optional[np.ndarray] = None
        self._noise_row_len: Optional[np.ndarray] = None
        self._noise_ptr = 0
        if self.with_noise and noise_bank_size > 0:
            self._build_noise_bank(noise_bank_size)

    def _stack_rows(self, rir_stack: np.ndarray) -> tuple:
        """One side-channel stack → (source (C, rir_len), noise
        (max_noise, C, rir_len)) fixed-shape rows."""
        if rir_stack.ndim == 2:
            rir_stack = rir_stack[:, None, :]
        src = self._prep_rir(rir_stack[0])
        c = src.shape[0]
        nr = rir_stack[1 : 1 + self.max_noise]
        nr = (
            np.stack([self._prep_rir(r) for r in nr])
            if len(nr)
            else np.zeros((0, c, self.rir_len), np.float32)
        )
        pad = self.max_noise - nr.shape[0]
        if pad > 0:
            nr = np.concatenate([nr, np.zeros((pad,) + nr.shape[1:], np.float32)])
        return src, nr

    def _build_bank(self, n: int) -> None:
        srcs, noises = [], []
        for _ in range(n):
            src, nr = self._stack_rows(next(self.rirs))
            srcs.append(src)
            noises.append(nr)
        self._bank = {"source_rir": np.stack(srcs)}
        if self.with_noise:
            self._bank["noise_rirs"] = np.stack(noises)

    def _faded_noise_row(self) -> tuple[np.ndarray, int]:
        """Pull one noise sample and run the host fade (fade_noise) exactly
        as the inline path does; return (row zero-padded to clip_len,
        active length)."""
        raw = _rms_normalize(np.ravel(next(self.noise)))
        faded = fade_noise(raw, self.clip_len, self.sr, self.rng)
        n_len = min(faded.shape[-1], self.clip_len)
        row = np.zeros((self.clip_len,), np.float32)
        row[:n_len] = faded[:n_len]
        if self.transfer_dtype == "int16":
            from wavjepa_tpu.data.pipeline import quantize_clip_int16

            row = quantize_clip_int16(row)
        return row, n_len

    def _build_noise_bank(self, n: int) -> None:
        rows, lens = [], []
        for _ in range(n):
            row, n_len = self._faded_noise_row()
            rows.append(row)
            lens.append(n_len)
        self._noise_bank = np.stack(rows)
        self._noise_row_len = np.asarray(lens, np.int64)

    def scene_bank(self) -> Optional[dict[str, np.ndarray]]:
        """The host copy of the device-resident scene bank
        ({"source_rir": (N, C, L)[, "noise_rirs": (N, M, C, L)]
        [, "noise": (Nn, clip_len)]}) — device_put it once, replicated."""
        bank = dict(self._bank) if self._bank is not None else {}
        if self._noise_bank is not None:
            bank["noise"] = self._noise_bank
        return bank or None

    def next_bank_refresh(self, k: int) -> dict[str, dict[str, np.ndarray]]:
        """Pull k fresh stacks/rows per active bank and assign them
        ring-buffer slots. Returns {"slots": {key: (k,) i32},
        "rows": {key: (k, ...)}} for ops/scenes.update_rir_bank. The host
        copy is NOT kept in sync — only slot assignment and row lengths live
        here; content goes straight to the device."""
        slots: dict[str, np.ndarray] = {}
        rows: dict[str, np.ndarray] = {}
        if self._bank is not None:
            n = self._bank["source_rir"].shape[0]
            rir_slots, srcs, noises = [], [], []
            for _ in range(k):
                src, nr = self._stack_rows(next(self.rirs))
                rir_slots.append(self._bank_ptr)
                self._bank_ptr = (self._bank_ptr + 1) % n
                srcs.append(src)
                noises.append(nr)
            slots["source_rir"] = np.asarray(rir_slots, np.int32)
            rows["source_rir"] = np.stack(srcs)
            if self.with_noise:
                slots["noise_rirs"] = slots["source_rir"]
                rows["noise_rirs"] = np.stack(noises)
        if self._noise_bank is not None:
            nn = self._noise_bank.shape[0]
            n_slots, n_rows = [], []
            for _ in range(k):
                row, n_len = self._faded_noise_row()
                n_slots.append(self._noise_ptr)
                self._noise_row_len[self._noise_ptr] = n_len
                self._noise_ptr = (self._noise_ptr + 1) % nn
                n_rows.append(row)
            slots["noise"] = np.asarray(n_slots, np.int32)
            rows["noise"] = np.stack(n_rows)
        return {"slots": slots, "rows": rows}

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
        from wavjepa_tpu.data.pipeline import quantize_clip_int16

        wire16 = self.transfer_dtype == "int16"
        for clip in self.audio:  # (1, clip_len) f32, −14 dBFS, 10 s
            audio = clip[0].astype(np.float32)  # (T32,)
            sample: dict[str, np.ndarray] = {
                "audio": quantize_clip_int16(audio) if wire16 else audio
            }
            if self.with_rir:
                if self._bank is not None:
                    sample["rir_index"] = np.int32(
                        self.rng.integers(self._bank["source_rir"].shape[0])
                    )
                else:
                    src, nr = self._stack_rows(next(self.rirs))
                    sample["source_rir"] = src
                    if self.with_noise:
                        sample["noise_rirs"] = nr  # (max_noise, C, rir_len)
            if self.with_noise:
                if self._noise_bank is not None:
                    j = int(self.rng.integers(self._noise_bank.shape[0]))
                    n_len = int(self._noise_row_len[j])
                    start = (
                        int(self.rng.integers(0, self.clip_len - n_len))
                        if self.clip_len > n_len
                        else 0
                    )
                    sample["noise_index"] = np.int32(j)
                else:
                    raw = next(self.noise)
                    raw = _rms_normalize(np.ravel(raw))
                    faded = fade_noise(raw, self.clip_len, self.sr, self.rng)
                    n_len = min(faded.shape[-1], self.clip_len)
                    start = 0
                    placed = np.zeros((self.clip_len,), np.float32)
                    if self.clip_len > n_len:
                        start = int(self.rng.integers(0, self.clip_len - n_len))
                    placed[start : start + n_len] = faded[:n_len]
                    sample["noise"] = (
                        quantize_clip_int16(placed) if wire16 else placed
                    )
                sample["noise_start"] = np.int32(start)
                sample["noise_length"] = np.int32(n_len)
                sample["snr"] = np.float32(
                    self.rng.uniform(self.snr_low, self.snr_high)
                )
            yield sample


def denoise_batches(
    source: DenoiseSampleSource,
    batch_size: int,
    refresh_rirs_per_batch: int = 0,
) -> Iterator[dict[str, np.ndarray]]:
    """Stack sample dicts into fixed-shape batch dicts.

    With a RIR bank active and ``refresh_rirs_per_batch > 0``, each batch
    additionally carries ``rir_bank_refresh`` (the payload for
    ops/scenes.update_rir_bank) — the training loop pops it off before the
    step and scatters it into the device bank."""
    it = iter(source)
    while True:
        samples = [next(it) for _ in range(batch_size)]
        batch = {k: np.stack([s[k] for s in samples]) for k in samples[0]}
        if refresh_rirs_per_batch > 0 and source.scene_bank() is not None:
            batch["rir_bank_refresh"] = source.next_bank_refresh(
                refresh_rirs_per_batch
            )
        yield batch
