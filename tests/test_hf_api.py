"""HF-parity inference surface driven with a tiny config: input_values →
(embeddings, timestamps) shape/timestamp contract (README.md:72-108)."""

import jax.numpy as jnp
import numpy as np
import pytest

from wavjepa_tpu.api.hf import WavJEPAFeatureExtractor, WavJEPAForAudioEmbeddings
from wavjepa_tpu.api.runtime import RuntimeJEPA, load_model
from wavjepa_tpu.models.jepa import JEPAConfig

TINY = JEPAConfig(
    conv_spec=((16, 10, 5), (16, 3, 2)),
    encoder_layers=2,
    encoder_dim=32,
    encoder_heads=4,
    decoder_layers=1,
    decoder_dim=16,
    decoder_heads=4,
    sample_rate=1600,
    process_seconds=0.201,
    average_top_k_layers=2,
)


def test_hf_model_contract():
    runtime = load_model("", config=TINY)
    model = WavJEPAForAudioEmbeddings(runtime)
    fx = WavJEPAFeatureExtractor(sampling_rate=TINY.sample_rate)

    rng = np.random.default_rng(0)
    ten_seconds = TINY.sample_rate * 10
    inputs = fx(0.2 * rng.standard_normal(ten_seconds).astype(np.float32))
    assert inputs.shape == (1, 1, ten_seconds)

    emb, ts = model(inputs)
    frames = TINY.frames_per_window
    # 10 s / 0.201 s → 50 windows (ceil w/ unconditional pad window handling)
    assert emb.ndim == 3 and emb.shape[0] == 1 and emb.shape[2] == TINY.encoder_dim
    assert emb.shape[1] >= 49 * frames
    assert ts.shape == (1, emb.shape[1])
    # timestamps are a uniform ms grid spanning the clip
    assert ts[0, 0] == pytest.approx(0.0)
    assert ts[0, -1] < 10_000.0
    diffs = np.diff(ts[0])
    assert np.allclose(diffs, diffs[0])


def test_feature_extractor_resamples():
    fx = WavJEPAFeatureExtractor(sampling_rate=1600)
    audio_800 = np.ones(800, np.float32)  # 1 s at 800 Hz
    batch = fx(audio_800, sampling_rate=800)
    assert batch.shape[-1] == 1600


def test_arch_hf_wrapper_model():
    from wavjepa_tpu.eval.arch import HFWrapperModel

    runtime = load_model("", config=TINY)
    model = HFWrapperModel(runtime)
    assert model.get_sampling_rate() == TINY.sample_rate
    assert model.get_classification_embedding_size() == TINY.encoder_dim
    audio = np.random.default_rng(0).standard_normal(TINY.sample_rate).astype(
        np.float32
    )
    emb = model.get_embeddings(audio)
    assert emb.shape == (TINY.encoder_dim,)
