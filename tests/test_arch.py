"""ARCH benchmark layer: recipe metadata parsing, probe protocol, fold
aggregation — driven end-to-end on synthetic dataset layouts."""

import os
from pathlib import Path

import numpy as np
import pytest

from wavjepa_tpu.eval.arch import (
    ClassificationDataset,
    ClassificationProbe,
    ESC50,
    Model,
    RAVDESS,
)

SR = 1000


class FakeArchModel(Model):
    """Spectral-feature embeddings (separable for distinct tones)."""

    def __init__(self):
        super().__init__(model=None)

    def get_embeddings(self, audio, **kwargs):
        return self.get_token_embeddings(audio).mean(axis=0)

    def get_token_embeddings(self, audio, **kwargs):
        audio = np.asarray(audio, np.float32).ravel()
        hop = SR // 10
        n = max(1, len(audio) // hop)
        frames = audio[: n * hop].reshape(n, hop)
        spec = np.abs(np.fft.rfft(frames, axis=-1))[:, :32]
        return spec.reshape(n, 8, 4).mean(-1).astype(np.float32)

    def get_classification_embedding_size(self):
        return 8

    def get_token_embedding_size(self):
        return 8

    def get_sampling_rate(self):
        return SR


def _tone(freq, seconds=1.0, amp=0.5, noise=0.01, rng=None):
    t = np.arange(int(SR * seconds)) / SR
    wav = amp * np.sin(2 * np.pi * freq * t)
    if rng is not None:
        wav = wav + noise * rng.standard_normal(len(t))
    return wav


def _write_wav(path, wav):
    from scipy.io import wavfile

    os.makedirs(os.path.dirname(path), exist_ok=True)
    wavfile.write(path, SR, (np.asarray(wav) * 32000).astype(np.int16))


FREQS = [30.0, 120.0, 320.0]


def _make_esc50_layout(root: Path, folds=3, per_class=4):
    rng = np.random.default_rng(0)
    rows = ["filename,fold,target,category"]
    for fold in range(1, folds + 1):
        for target, freq in enumerate(FREQS):
            for k in range(per_class):
                name = f"{fold}-{target}-{k}.wav"
                _write_wav(
                    str(root / "audio" / name), _tone(freq, rng=rng)
                )
                rows.append(f"{name},{fold},{target},c{target}")
    os.makedirs(root / "meta", exist_ok=True)
    (root / "meta" / "esc50.csv").write_text("\n".join(rows) + "\n")


def _make_ravdess_layout(root: Path, per_class=10):
    rng = np.random.default_rng(1)
    for emotion, freq in enumerate(FREQS, start=1):
        for k in range(per_class):
            name = f"03-01-{emotion:02d}-01-01-{k:02d}-01.wav"
            _write_wav(str(root / f"Actor_{k % 4:02d}" / name), _tone(freq, rng=rng))


def test_esc50_recipe_end_to_end(tmp_path):
    _make_esc50_layout(tmp_path)
    recipe = ESC50(str(tmp_path))
    assert recipe.num_classes == 3
    assert len(recipe.folds) == 3
    model = FakeArchModel()
    results = recipe.evaluate(model, mode="linear", max_num_epochs=60, batch_size=8, learning_rate=5e-2)
    assert results["accuracy"] >= 0.9
    assert "f1" in results and "accuracy_std" in results


def test_ravdess_recipe_end_to_end(tmp_path):
    _make_ravdess_layout(tmp_path)
    recipe = RAVDESS(str(tmp_path))
    assert recipe.num_classes == 3
    model = FakeArchModel()
    results = recipe.evaluate(model, mode="non-linear", max_num_epochs=60, batch_size=8, learning_rate=5e-2)
    assert results["accuracy"] >= 0.8


def test_attention_pooling_probe():
    """Attention-pooling mode consumes (B, T, E) token embeddings."""
    rng = np.random.default_rng(0)
    n, t, e, c = 30, 7, 8, 3
    x = 0.1 * rng.standard_normal((n, t, e)).astype(np.float32)
    y = rng.integers(0, c, n)
    for i in range(n):
        x[i, :, y[i]] += 3.0
    probe = ClassificationProbe(
        input_embedding_size=e, num_classes=c, mode="attention-pooling"
    )
    probe.train((x[:20], y[:20]), (x[20:], y[20:]), learning_rate=5e-2, max_num_epochs=30, batch_size=10)
    metrics = probe.evaluate((x[20:], y[20:]))
    assert metrics["accuracy"] >= 0.8


def test_multilabel_probe_metrics():
    rng = np.random.default_rng(0)
    n, e, c = 40, 8, 4
    y = (rng.random((n, c)) > 0.5).astype(np.float32)
    x = (y @ rng.standard_normal((c, e)) + 0.05 * rng.standard_normal((n, e))).astype(
        np.float32
    )
    probe = ClassificationProbe(
        input_embedding_size=e, num_classes=c, is_multilabel=True
    )
    metrics = probe.train((x[:30], y[:30]), (x[30:], y[30:]), learning_rate=5e-2,
                          max_num_epochs=60, batch_size=10)
    assert metrics["map_macro"] > 0.8
    assert "map_weighted" in metrics


def test_classification_dataset_precompute(tmp_path):
    rng = np.random.default_rng(0)
    paths = []
    for i in range(4):
        p = tmp_path / f"x{i}.wav"
        _write_wav(str(p), _tone(FREQS[i % 3], rng=rng))
        paths.append(str(p))
    ds = ClassificationDataset(
        audio_paths=paths, labels=[0, 1, 2, 0], model=FakeArchModel(),
        sampling_rate=SR, batch_size=2,
    )
    x, y = ds.arrays()
    assert x.shape == (4, 8)
    assert list(y) == [0, 1, 2, 0]


def test_sequence_probe_with_lstm():
    from wavjepa_tpu.eval.arch import SequenceProbe

    rng = np.random.default_rng(0)
    n, t, e, c = 20, 9, 8, 3
    y = rng.integers(0, c, (n, t))
    x = 0.1 * rng.standard_normal((n, t, e)).astype(np.float32)
    for i in range(n):
        for j in range(t):
            x[i, j, y[i, j]] += 3.0
    probe = SequenceProbe(
        input_embedding_size=e, num_classes=c, use_lstm=True, lstm_dim=8
    )
    probe.train((x[:14], y[:14]), (x[14:], y[14:]), learning_rate=3e-2,
                max_num_epochs=25, batch_size=7)
    metrics = probe.evaluate((x[14:], y[14:]))
    assert metrics["accuracy"] >= 0.7


def test_download_registry_covers_all_recipes(tmp_path, capsys):
    """ARCH data_download counterpart: every recipe has a registry entry and
    the dry-run plan is printable without network access."""
    from wavjepa_tpu.eval.arch import download as dl

    assert len(dl.REGISTRY) == 12
    for name, spec in dl.REGISTRY.items():
        assert spec.archives, name
        for arc in spec.archives:
            assert arc.url.startswith("http"), (name, arc.url)
    rc = dl.main(["--all", "--root", str(tmp_path / "ds"), "--dry-run"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "esc50" in out and "fetch" in out
    # dry-run must not create anything
    assert not (tmp_path / "ds").exists()


def test_resolve_audio_path_prefers_transcoded_sibling(tmp_path):
    from wavjepa_tpu.eval.arch.recipes import resolve_audio_path

    mp3 = tmp_path / "000002.mp3"
    assert resolve_audio_path(str(mp3)) == str(mp3)  # no sibling yet
    wav = tmp_path / "000002.wav"
    wav.write_bytes(b"")
    assert resolve_audio_path(str(mp3)) == str(wav)
    assert resolve_audio_path(str(tmp_path / "x.flac")) == str(tmp_path / "x.flac")


def test_embedding_cache_shared_across_folds_and_modes(tmp_path):
    """Each unique clip is pushed through the model ONCE per recipe even
    across LOOCV folds and probe modes (was folds x modes times)."""
    _make_esc50_layout(tmp_path)
    model = FakeArchModel()
    calls = {"n": 0}
    orig = model.get_embeddings

    def counting(audio, **kwargs):
        calls["n"] += 1
        return orig(audio, **kwargs)

    model.get_embeddings = counting
    recipe = ESC50(str(tmp_path))
    n_clips = len(recipe._all_audio_paths())
    recipe.evaluate(model, mode="linear", max_num_epochs=2, batch_size=8)
    assert calls["n"] == n_clips, (calls["n"], n_clips)
    recipe.evaluate(model, mode="non-linear", max_num_epochs=2, batch_size=8)
    assert calls["n"] == n_clips  # second mode fully cache-served
