"""Whole-clip inference mode: a 10-s window config yields 999 tokens in one
pass (SURVEY.md §5 long-context note — the reference only chunks; here the
static-shape design makes whole-clip a pure config choice, and the Pallas
attention kernel covers the T where XLA's T×T logits get expensive)."""

import jax
import jax.numpy as jnp
import numpy as np

from wavjepa_tpu.models.jepa import JEPA, JEPAConfig

TINY_WHOLE = JEPAConfig(
    conv_spec=((16, 10, 5), (16, 3, 2)),
    encoder_layers=2,
    encoder_dim=32,
    encoder_heads=4,
    decoder_layers=1,
    decoder_dim=16,
    decoder_heads=4,
    sample_rate=1600,
    process_seconds=10.0,  # whole clip, no chunking
    average_top_k_layers=2,
)


def test_whole_clip_token_count_and_forward():
    # 16 kHz full-scale equivalent: 160000 samples → 999 tokens (SURVEY §3.5)
    full = JEPAConfig()
    frames_10s = (
        JEPAConfig(process_seconds=10.0).frames_per_window
    )
    assert frames_10s == 999

    model = JEPA(TINY_WHOLE)
    audio = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 1, TINY_WHOLE.target_length)),
        jnp.float32,
    )
    params = model.init(jax.random.PRNGKey(0), audio)["params"]
    out = model.apply({"params": params}, audio, method="represent")
    assert out.shape == (2, TINY_WHOLE.total_patches, TINY_WHOLE.encoder_dim)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_whole_clip_weights_interchangeable_with_chunked():
    """Conv/encoder weights are length-agnostic; only the (fixed, non-trained)
    pos table differs — a chunked-trained checkpoint loads directly into the
    whole-clip config."""
    chunked = JEPAConfig(
        conv_spec=TINY_WHOLE.conv_spec,
        encoder_layers=2, encoder_dim=32, encoder_heads=4,
        decoder_layers=1, decoder_dim=16, decoder_heads=4,
        sample_rate=1600, process_seconds=0.201, average_top_k_layers=2,
    )
    m_chunk = JEPA(chunked)
    params = m_chunk.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 1, chunked.target_length))
    )["params"]
    m_whole = JEPA(TINY_WHOLE)
    audio = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, 1, TINY_WHOLE.target_length)),
        jnp.float32,
    )
    out = m_whole.apply({"params": params}, audio, method="represent")
    assert out.shape[1] == TINY_WHOLE.total_patches
    assert bool(jnp.all(jnp.isfinite(out)))
