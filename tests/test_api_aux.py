"""Auxiliary API surfaces: HF-style feature extractor, heaRIR eval-time
augmenter, multi-device command sharding."""

import json

import numpy as np
import pytest

from wavjepa_tpu.api.hearir import Augmenter, NoiseIterator, SceneIterator
from wavjepa_tpu.api.hf import WavJEPAFeatureExtractor
from wavjepa_tpu.eval.multidevice import run_commands


def test_feature_extractor_shapes_and_normalization():
    fx = WavJEPAFeatureExtractor()
    audio = 0.3 * np.random.default_rng(0).standard_normal(16000).astype(np.float32)
    batch = fx(audio)
    assert batch.shape == (1, 1, 16000)
    rms = np.sqrt(np.mean(batch**2))
    target = 10 ** (-14.0 / 20.0)
    assert rms == pytest.approx(target, rel=1e-3)
    # stereo in, mono model → averaged
    stereo = np.stack([audio, audio])
    assert fx(stereo[None]).shape == (1, 1, 16000)
    # binaural extractor keeps channels
    fx2 = WavJEPAFeatureExtractor(in_channels=2)
    assert fx2(stereo[None]).shape == (1, 2, 16000)


def _write_scene_spec(tmp_path, channels=2, n_noise=2):
    rng = np.random.default_rng(0)
    rirs = []
    for i in range(1 + n_noise):
        rir = np.zeros((channels, 400), np.float32)
        rir[:, 0] = 1.0
        rir[:, 1:50] = 0.02 * rng.standard_normal((channels, 49))
        p = tmp_path / f"rir_{i}.npy"
        np.save(p, rir)
        rirs.append(str(p))
    spec = {
        "sampled_regions": [
            {
                "region": {
                    "scene": {
                        "source": {"rir": {"binaural_rir_path": rirs[0]}},
                        "noise": [
                            {"rir": {"binaural_rir_path": r}} for r in rirs[1:]
                        ],
                    }
                }
            }
        ]
    }
    spec_path = tmp_path / "scene.json"
    spec_path.write_text(json.dumps(spec))
    return str(spec_path)


def test_scene_iterator_and_augmenter(tmp_path):
    spec = _write_scene_spec(tmp_path)
    it = SceneIterator([spec], rir_type="binaural", sr=1000, rir_seconds=0.5)
    source_rir, noise_rirs, meta = next(it)
    assert source_rir.shape == (2, 500)
    assert len(noise_rirs) == 2

    rng = np.random.default_rng(1)
    audio = rng.standard_normal(2000).astype(np.float32)
    noise = rng.standard_normal(2000).astype(np.float32)

    aug = Augmenter(it, sr=1000, snr=0.0)
    out = aug.augment(audio, noise)
    assert out.shape == (2, 2000)
    assert np.all(np.isfinite(out))
    # no scene iterator → pass-through
    aug2 = Augmenter(None, sr=1000, snr=None)
    np.testing.assert_allclose(aug2.augment(audio)[0], audio)


def test_noise_iterator(tmp_path):
    from scipy.io import wavfile

    rng = np.random.default_rng(0)
    for i in range(3):
        wavfile.write(
            tmp_path / f"n{i}.wav", 1000,
            (0.1 * rng.standard_normal(500) * 32000).astype(np.int16),
        )
    it = NoiseIterator(str(tmp_path), sr=1000)
    noise = next(it)
    assert noise.ndim == 1 and noise.shape[0] == 500


def test_multidevice_run_commands(tmp_path):
    cmds = [
        f"echo dev-$TPU_VISIBLE_CHIPS > {tmp_path}/out_{i}.txt" for i in range(4)
    ]
    codes = run_commands(cmds, num_devices=2)
    assert codes == [0, 0, 0, 0]
    devices = [
        (tmp_path / f"out_{i}.txt").read_text().strip() for i in range(4)
    ]
    # every command got a valid exclusive device from the 2-device free-list
    assert all(d in ("dev-0", "dev-1") for d in devices)
