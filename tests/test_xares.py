"""X-ARES surface tests: encoder contract (first-party checker twin of
xares.audio_encoder_checker) + the stub task end-to-end
(frozen encoder → embeddings → probe → accuracy)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from wavjepa_tpu.api.runtime import RuntimeJEPA
from wavjepa_tpu.eval.xares import WavJEPAEncoder, check_audio_encoder
from wavjepa_tpu.eval.xares.run import run_stub_task
from wavjepa_tpu.models.jepa import JEPA, JEPAConfig

SMALL = JEPAConfig(
    conv_spec=((32, 10, 5), (32, 3, 2), (32, 2, 2)),
    encoder_layers=2,
    encoder_dim=64,
    encoder_heads=4,
    decoder_layers=1,
    decoder_dim=32,
    decoder_heads=4,
    sample_rate=1600,
    process_seconds=0.201,
)


def _small_encoder() -> WavJEPAEncoder:
    model = JEPA(SMALL)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 1, SMALL.target_length))
    )["params"]
    return WavJEPAEncoder(runtime=RuntimeJEPA(SMALL, params))


def test_encoder_contract():
    enc = _small_encoder()
    assert check_audio_encoder(enc)
    assert enc.sampling_rate == 1600
    assert enc.output_dim == 64
    expected_hop = 1000.0 * (SMALL.target_length / SMALL.frames_per_window) / 1600
    assert abs(enc.hop_size_in_ms - expected_hop) < 1e-6


def test_encoder_frame_math():
    enc = _small_encoder()
    out = enc(torch.zeros(2, SMALL.target_length))
    # one exact window → frames_per_window frames
    assert out.shape == (2, SMALL.frames_per_window, 64)


class TestVendoredProtocol:
    """Encoder contract vs the vendored task-module protocol (the interface
    a real src/tasks/*_task.py drives, VERDICT r3 #8) — not just the stub."""

    def test_encoder_class_discovery(self):
        """xares.run finds the encoder class by module inspection; our
        encoder.py must expose exactly one nn.Module for that discovery."""
        import wavjepa_tpu.eval.xares.encoder as encmod
        from wavjepa_tpu.eval.xares.vendored_protocol import (
            discover_encoder_class,
        )

        cls = discover_encoder_class(encmod.__file__)
        # the file is re-imported under a fresh module name (as xares.run
        # does), so compare identity by name, not object
        assert cls.__name__ == "WavJEPAEncoder"
        assert issubclass(cls, __import__("torch").nn.Module)

    def test_task_config_factory_shape(self):
        from wavjepa_tpu.eval.xares.vendored_protocol import config_esc50

        enc = _small_encoder()
        cfg = config_esc50(enc)
        assert cfg.encoder is enc
        assert cfg.name == "esc50" and cfg.formal_name == "ESC-50"
        assert cfg.output_dim == 50 and cfg.metric == "accuracy"
        assert list(cfg.k_fold_splits) == [1, 2, 3, 4, 5]
        assert cfg.crop_length_s == 5.0
        assert cfg.label_processor({"label": "dog"}) == "dog"

    def test_protocol_end_to_end(self):
        """Full chain: TaskConfig → checker → crop/batch encode → mean pool
        → MLP probe → metric, on a fabricated 4-class tone task with
        string labels and variable-length audio (what label_processor and
        crop_length_s exist for)."""
        from wavjepa_tpu.eval.xares.vendored_protocol import (
            TaskConfig,
            run_task_protocol,
        )

        enc = _small_encoder()
        sr = enc.sampling_rate
        rng = np.random.default_rng(0)
        names = ["dog", "rain", "siren", "chirp"]

        def make(n_per_class):
            out = []
            for k, name in enumerate(names):
                f = 110.0 * (2.0**k)
                for _ in range(n_per_class):
                    dur = rng.uniform(0.4, 0.9)  # variable length
                    t = np.arange(int(sr * dur)) / sr
                    wav = rng.uniform(0.4, 0.9) * np.sin(
                        2 * np.pi * f * t + rng.uniform(0, 2 * np.pi)
                    ) + 0.05 * rng.standard_normal(t.size)
                    out.append({"audio": wav.astype(np.float32), "label": name})
            rng.shuffle(out)
            return out

        cfg = TaskConfig(
            encoder=enc,
            name="tones4",
            output_dim=len(names),
            label_processor=lambda s: s["label"],
            crop_length_s=0.6,
            batch_size_encode=8,
            learning_rate=1e-2,
            epochs=10,
        )
        result = run_task_protocol(
            cfg, {"train": make(16), "valid": make(4), "test": make(6)}
        )
        assert result["metric"] == "accuracy"
        assert result["n_test"] == len(names) * 6
        assert result["value"] > 0.5, result
        # the unsupervised kNN leg rides along (do_knn defaults True) and
        # tones at octave spacing are kNN-separable from mean-pooled
        # random-encoder features too
        assert result["knn_accuracy"] > 0.5, result

    def test_fsd50k_factory_shape(self):
        from wavjepa_tpu.eval.xares.vendored_protocol import config_fsd50k

        enc = _small_encoder()
        cfg = config_fsd50k(enc)
        assert cfg.metric == "mAP" and cfg.output_dim == 200
        assert cfg.do_knn is False  # kNN is single-label-only in the harness
        vec = cfg.label_processor({"labels": [3, 17]})
        assert vec.shape == (200,) and vec[3] == 1.0 and vec[17] == 1.0
        assert vec.sum() == 2.0

    def test_protocol_multilabel_map(self):
        """mAP branch end-to-end: a 4-class MULTILABEL tone task (each clip
        mixes 1-2 tones; labels are the multi-hot of present tones). The
        BCE probe on mean-pooled embeddings must beat the chance mAP
        (= mean label prevalence) by a wide margin."""
        from wavjepa_tpu.eval.xares.vendored_protocol import (
            TaskConfig,
            mean_average_precision,
            run_task_protocol,
        )

        enc = _small_encoder()
        sr = enc.sampling_rate
        rng = np.random.default_rng(1)
        n_classes = 4

        def make(n):
            out = []
            for _ in range(n):
                k = sorted(
                    rng.choice(n_classes, size=int(rng.integers(1, 3)), replace=False)
                )
                t = np.arange(int(sr * rng.uniform(0.5, 0.9))) / sr
                wav = sum(
                    rng.uniform(0.3, 0.7)
                    * np.sin(2 * np.pi * 110.0 * (2.0**c) * t + rng.uniform(0, 6.28))
                    for c in k
                ) + 0.05 * rng.standard_normal(t.size)
                out.append({"audio": wav.astype(np.float32), "labels": list(k)})
            return out

        def to_multihot(sample):
            vec = np.zeros((n_classes,), np.float32)
            vec[np.asarray(sample["labels"], np.int64)] = 1.0
            return vec

        cfg = TaskConfig(
            encoder=enc,
            name="tones4ml",
            metric="mAP",
            output_dim=n_classes,
            label_processor=to_multihot,
            crop_length_s=0.6,
            batch_size_encode=8,
            learning_rate=1e-2,
            epochs=10,
            do_knn=False,
        )
        splits = {"train": make(96), "valid": make(16), "test": make(48)}
        result = run_task_protocol(cfg, splits)
        assert result["metric"] == "mAP"
        assert "knn_accuracy" not in result
        chance = float(
            np.mean([to_multihot(s) for s in splits["test"]])
        )  # mean prevalence ≈ random-score mAP
        assert result["value"] > chance + 0.25, (result, chance)

    def test_map_firstparty_matches_sklearn(self):
        """The dependency-free AP fallback must agree with sklearn on a
        random multilabel problem (guards the fixture if sklearn vanishes)."""
        from sklearn.metrics import average_precision_score

        from wavjepa_tpu.eval.xares import vendored_protocol as vp

        rng = np.random.default_rng(2)
        scores = rng.standard_normal((64, 6))
        targets = (rng.uniform(size=(64, 6)) < 0.3).astype(np.float32)
        targets[:, 5] = 0.0  # a positives-free class must be excluded
        got = vp.mean_average_precision(scores, targets)
        keep = targets.sum(0) > 0
        want = average_precision_score(
            targets[:, keep], scores[:, keep], average="macro"
        )
        assert abs(got - want) < 1e-9
        # and the hand-rolled branch itself agrees
        aps = []
        for c in range(targets.shape[1]):
            t = targets[:, c]
            if t.sum() == 0:
                continue
            order = np.argsort(-scores[:, c], kind="stable")
            ts = t[order]
            precision = np.cumsum(ts) / np.arange(1, len(ts) + 1)
            aps.append(float((precision * ts).sum() / ts.sum()))
        assert abs(float(np.mean(aps)) - want) < 1e-9

    def test_knn_classify(self):
        """kNN leg in isolation: separable clusters → perfect votes; the
        cosine normalization must ignore per-point scale."""
        from wavjepa_tpu.eval.xares.vendored_protocol import knn_classify

        rng = np.random.default_rng(3)
        centers = np.eye(3, 8) * 5.0
        x_tr = np.repeat(centers, 20, axis=0) + 0.1 * rng.standard_normal((60, 8))
        y_tr = np.repeat(np.arange(3), 20)
        scale = rng.uniform(0.5, 2.0, size=(12, 1))  # scale-invariance
        x_te = (np.repeat(centers, 4, axis=0) + 0.1 * rng.standard_normal((12, 8))) * scale
        y_te = np.repeat(np.arange(3), 4)
        assert (knn_classify(x_tr, y_tr, x_te, k=5) == y_te).all()


def test_stub_task_end_to_end():
    enc = _small_encoder()
    result = run_stub_task(enc, seed=0)
    assert result["metric"] == "accuracy"
    assert 0.0 <= result["value"] <= 1.0
    assert result["n_test"] > 0
    # tones at octave spacing are linearly separable even from a random
    # conv+transformer encoder's mean-pooled features
    assert result["value"] > 0.5, result
