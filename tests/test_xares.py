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


def test_stub_task_end_to_end():
    enc = _small_encoder()
    result = run_stub_task(enc, seed=0)
    assert result["metric"] == "accuracy"
    assert 0.0 <= result["value"] <= 1.0
    assert result["n_test"] > 0
    # tones at octave spacing are linearly separable even from a random
    # conv+transformer encoder's mean-pooled features
    assert result["value"] > 0.5, result
