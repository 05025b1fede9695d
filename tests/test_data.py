"""Data-layer tests: shard IO, decode, resample quality, preprocessing."""

import io
import tarfile

import numpy as np
import jax.numpy as jnp
import pytest

from wavjepa_tpu.data.decode import decode_audio, decode_wav
from wavjepa_tpu.data.resample import resample_jax, resample_np
from wavjepa_tpu.data.shards import (
    expand_shard_pattern,
    iter_tar_samples,
    split_shards,
)


def make_shard(path, n_samples=4, sr=16000, seconds=0.5):
    """Write a webdataset-style tar with wav payloads."""
    from scipy.io import wavfile

    rng = np.random.default_rng(0)
    with tarfile.open(path, "w") as tar:
        for i in range(n_samples):
            wav = (rng.normal(size=int(sr * seconds)) * 8000).astype(np.int16)
            buf = io.BytesIO()
            wavfile.write(buf, sr, wav)
            data = buf.getvalue()
            info = tarfile.TarInfo(name=f"sample{i:04d}.wav")
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))
            meta = b'{"label": %d}' % i
            info2 = tarfile.TarInfo(name=f"sample{i:04d}.json")
            info2.size = len(meta)
            tar.addfile(info2, io.BytesIO(meta))
    return path


class TestShards:
    def test_brace_expansion(self):
        out = expand_shard_pattern("shard-{000008..000011}.tar")
        assert out == [
            "shard-000008.tar",
            "shard-000009.tar",
            "shard-000010.tar",
            "shard-000011.tar",
        ]
        assert expand_shard_pattern("plain.tar") == ["plain.tar"]

    def test_split_deterministic_and_disjoint(self):
        shards = [f"s{i}" for i in range(16)]
        seen = []
        for host in range(2):
            for worker in range(4):
                part = split_shards(shards, host, 2, worker, 4)
                seen.extend(part)
        assert sorted(seen) == sorted(shards)  # partition, no overlap

    def test_tar_iteration_groups_extensions(self, tmp_path):
        shard = make_shard(str(tmp_path / "test.tar"))
        samples = list(iter_tar_samples(shard))
        assert len(samples) == 4
        for key, payload in samples:
            assert set(payload) == {"wav", "json"}
        wav, sr = decode_audio(samples[0][1])
        assert sr == 16000
        assert wav.shape[0] == 1 and wav.dtype == np.float32
        assert np.abs(wav).max() <= 1.0


class TestDecode:
    def test_wav_pcm16_roundtrip(self):
        from scipy.io import wavfile

        sr = 8000
        x = (np.sin(2 * np.pi * 440 * np.arange(sr) / sr) * 32000).astype(np.int16)
        buf = io.BytesIO()
        wavfile.write(buf, sr, x)
        wav, got_sr = decode_wav(buf.getvalue())
        assert got_sr == sr
        np.testing.assert_allclose(wav[0], x / 32768.0, atol=1e-6)


class TestResample:
    @pytest.mark.parametrize("sr_in,sr_out", [(32000, 16000), (48000, 16000), (22050, 16000)])
    def test_tone_preserved(self, sr_in, sr_out):
        """A 1 kHz tone survives resampling with unit gain and the right
        number of output samples."""
        dur = 0.5
        t_in = np.arange(int(sr_in * dur)) / sr_in
        x = np.sin(2 * np.pi * 1000 * t_in).astype(np.float32)
        y = resample_np(x[None, :], sr_in, sr_out)[0]
        assert y.shape[0] == int(np.ceil(x.shape[0] * sr_out / sr_in))
        t_out = np.arange(y.shape[0]) / sr_out
        expected = np.sin(2 * np.pi * 1000 * t_out)
        # ignore filter edges
        m = slice(200, -200)
        err = np.abs(y[m] - expected[m]).max()
        assert err < 1e-3, err

    def test_jax_matches_numpy(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 1, 3200)).astype(np.float32)
        yn = resample_np(x, 32000, 16000)
        yj = np.asarray(resample_jax(jnp.asarray(x), 32000, 16000))
        np.testing.assert_allclose(yj, yn, atol=1e-5)

    def test_identity(self):
        x = np.random.default_rng(1).normal(size=(1, 100)).astype(np.float32)
        assert resample_np(x, 16000, 16000) is x


def test_mixed_source_workers_cover_all_shards(tmp_path):
    """Every shard of every mixed source must be assigned to exactly one
    worker (striping by a global worker id left half of each source unread)."""
    import numpy as np

    from wavjepa_tpu.data.pipeline import ShardAudioSource

    pats = []
    expected = {}
    for s in range(2):
        paths = []
        for i in range(8):
            p = tmp_path / f"src{s}-{i:04d}.tar"
            p.write_bytes(b"")
            paths.append(str(p))
        pats.append(str(tmp_path / f"src{s}-{{0000..0007}}.tar"))
        expected[s] = set(paths)

    src = ShardAudioSource(
        pats, mixing_weights=[0.5, 0.5], num_workers=8, backend="thread"
    )
    assigned = [t._args[0] for t in src._threads]
    assert len(assigned) == 8
    seen = [set(), set()]
    for shards in assigned:
        for sh in shards:
            idx = 0 if "src0" in sh else 1
            assert sh not in seen[idx], f"shard {sh} assigned twice"
            seen[idx].add(sh)
    assert seen[0] == expected[0]
    assert seen[1] == expected[1]
