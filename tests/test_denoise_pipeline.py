"""Host-side denoise data plane: npy side-channel tar shards → fixed-shape
sample dicts → batches (reference WebAudioDataModuleDenoiser semantics)."""

import io
import tarfile

import numpy as np
import pytest


def _write_npy_tar(path, arrays):
    with tarfile.open(path, "w") as tar:
        for i, arr in enumerate(arrays):
            buf = io.BytesIO()
            np.save(buf, arr)
            data = buf.getvalue()
            info = tarfile.TarInfo(name=f"sample_{i:04d}.npy")
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))


def _write_flac_like_wav_tar(path, clips, sr):
    from scipy.io import wavfile

    with tarfile.open(path, "w") as tar:
        for i, clip in enumerate(clips):
            buf = io.BytesIO()
            wavfile.write(buf, sr, (clip * 32000).astype(np.int16))
            data = buf.getvalue()
            info = tarfile.TarInfo(name=f"clip_{i:04d}.wav")
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))


def test_npy_side_source_streams(tmp_path):
    from wavjepa_tpu.data.denoise_pipeline import NpySideSource

    rng = np.random.default_rng(0)
    arrays = [rng.standard_normal((3, 1, 64)).astype(np.float32) for _ in range(8)]
    shard = tmp_path / "rirs-0000.tar"
    _write_npy_tar(shard, arrays)

    src = NpySideSource(str(shard), num_workers=1, shuffle_buffer=2, seed=0).start()
    got = [next(src) for _ in range(4)]
    src.stop()
    assert all(g.shape == (3, 1, 64) for g in got)


def test_denoise_sample_source_shapes(tmp_path):
    from wavjepa_tpu.data.denoise_pipeline import (
        DenoiseSampleSource,
        denoise_batches,
    )

    sr = 3200
    rng = np.random.default_rng(1)
    audio_shard = tmp_path / "audio-0000.tar"
    _write_flac_like_wav_tar(
        audio_shard, [0.3 * rng.standard_normal(sr * 4) for _ in range(6)], sr
    )
    rir_shard = tmp_path / "rirs-0000.tar"
    rirs = []
    for _ in range(4):
        r = np.zeros((3, 1, 200), np.float32)
        r[:, :, 0] = 1.0
        rirs.append(r)
    _write_npy_tar(rir_shard, rirs)
    noise_shard = tmp_path / "noise-0000.tar"
    _write_npy_tar(
        noise_shard,
        [0.1 * rng.standard_normal(sr * 2).astype(np.float32) for _ in range(4)],
    )

    source = DenoiseSampleSource(
        str(audio_shard),
        rir_pattern=str(rir_shard),
        noise_pattern=str(noise_shard),
        sr=sr,
        target_seconds=3.0,
        max_noise_sources=2,
        rir_seconds=0.1,
        num_workers=1,
    )
    try:
        batch = next(denoise_batches(source, batch_size=2))
    finally:
        source.stop()

    clip_len = sr * 3
    rir_len = int(sr * 0.1)
    assert batch["audio"].shape == (2, clip_len)
    assert batch["source_rir"].shape == (2, 1, rir_len)
    assert batch["noise"].shape == (2, clip_len)
    assert batch["noise_rirs"].shape == (2, 2, 1, rir_len)
    assert batch["noise_start"].dtype == np.int32
    assert batch["snr"].shape == (2,)
    # noise placed within [start, start+length)
    for i in range(2):
        start = int(batch["noise_start"][i])
        length = int(batch["noise_length"][i])
        outside = np.concatenate(
            [batch["noise"][i][:start], batch["noise"][i][start + length:]]
        )
        assert np.allclose(outside, 0.0)


def test_bank_and_int16_wire(tmp_path):
    """rir_bank_size pre-pulls stacks into a host bank; samples then carry a
    4-byte rir_index instead of inline RIRs, audio/noise ship int16, and
    denoise_batches attaches the per-batch bank-refresh payload
    (VERDICT r4 #1 wire fixes)."""
    from wavjepa_tpu.data.denoise_pipeline import (
        DenoiseSampleSource,
        denoise_batches,
    )

    sr = 3200
    rng = np.random.default_rng(2)
    audio_shard = tmp_path / "audio-0000.tar"
    _write_flac_like_wav_tar(
        audio_shard, [0.3 * rng.standard_normal(sr * 4) for _ in range(6)], sr
    )
    rir_shard = tmp_path / "rirs-0000.tar"
    rirs = []
    for j in range(6):
        r = np.zeros((3, 1, 200), np.float32)
        r[:, :, 0] = 1.0 + j
        rirs.append(r)
    _write_npy_tar(rir_shard, rirs)
    noise_shard = tmp_path / "noise-0000.tar"
    _write_npy_tar(
        noise_shard,
        [0.1 * rng.standard_normal(sr * 2).astype(np.float32) for _ in range(4)],
    )

    source = DenoiseSampleSource(
        str(audio_shard),
        rir_pattern=str(rir_shard),
        noise_pattern=str(noise_shard),
        sr=sr,
        target_seconds=3.0,
        max_noise_sources=2,
        rir_seconds=0.1,
        num_workers=1,
        transfer_dtype="int16",
        rir_bank_size=3,
    )
    try:
        bank = source.scene_bank()
        rir_len = int(sr * 0.1)
        assert bank["source_rir"].shape == (3, 1, rir_len)
        assert bank["noise_rirs"].shape == (3, 2, 1, rir_len)
        assert "noise" not in bank  # noise bank not requested here
        batch = next(
            denoise_batches(source, batch_size=2, refresh_rirs_per_batch=1)
        )
    finally:
        source.stop()

    assert batch["audio"].dtype == np.int16
    assert batch["noise"].dtype == np.int16
    assert "source_rir" not in batch and "noise_rirs" not in batch
    assert batch["rir_index"].shape == (2,)
    assert all(0 <= i < 3 for i in batch["rir_index"])
    refresh = batch["rir_bank_refresh"]
    slots, rows = refresh["slots"], refresh["rows"]
    assert slots["source_rir"].shape == (1,) and slots["source_rir"][0] == 0
    assert (slots["noise_rirs"] == slots["source_rir"]).all()  # shared ring
    assert rows["source_rir"].shape == (1, 1, rir_len)
    assert rows["noise_rirs"].shape == (1, 2, 1, rir_len)
    # int16 wire zero-preserves the placed-noise silence
    for i in range(2):
        start = int(batch["noise_start"][i])
        length = int(batch["noise_length"][i])
        outside = np.concatenate(
            [batch["noise"][i][:start], batch["noise"][i][start + length:]]
        )
        assert (outside == 0).all()


def test_noise_bank(tmp_path):
    """noise_bank_size stores FADED rows; samples then carry noise_index +
    placement metadata instead of the placed buffer, and the refresh payload
    carries the noise ring's own slots."""
    from wavjepa_tpu.data.denoise_pipeline import (
        DenoiseSampleSource,
        denoise_batches,
    )

    sr = 3200
    rng = np.random.default_rng(3)
    audio_shard = tmp_path / "audio-0000.tar"
    _write_flac_like_wav_tar(
        audio_shard, [0.3 * rng.standard_normal(sr * 4) for _ in range(6)], sr
    )
    noise_shard = tmp_path / "noise-0000.tar"
    _write_npy_tar(
        noise_shard,
        [0.1 * rng.standard_normal(sr * 2).astype(np.float32) for _ in range(4)],
    )

    source = DenoiseSampleSource(
        str(audio_shard),
        noise_pattern=str(noise_shard),
        sr=sr,
        target_seconds=3.0,
        num_workers=1,
        transfer_dtype="int16",
        noise_bank_size=3,
    )
    clip_len = sr * 3
    try:
        bank = source.scene_bank()
        assert set(bank) == {"noise"}
        assert bank["noise"].shape == (3, clip_len)
        assert bank["noise"].dtype == np.int16  # int16 wire
        batch = next(
            denoise_batches(source, batch_size=2, refresh_rirs_per_batch=2)
        )
    finally:
        source.stop()

    assert "noise" not in batch
    assert batch["noise_index"].shape == (2,)
    assert all(0 <= i < 3 for i in batch["noise_index"])
    # start + length stays inside the clip (the device shift relies on it)
    for i in range(2):
        n_len = int(batch["noise_length"][i])
        assert 0 < n_len <= clip_len
        assert 0 <= int(batch["noise_start"][i]) <= clip_len - n_len
    refresh = batch["rir_bank_refresh"]
    np.testing.assert_array_equal(refresh["slots"]["noise"], [0, 1])  # own ring
    assert refresh["rows"]["noise"].shape == (2, clip_len)
    assert refresh["rows"]["noise"].dtype == np.int16
