"""Golden-vector fixture replay (VERDICT r3 #7).

`scripts/check_real_weights.py --dump-fixtures` (run ONCE on a networked
machine) stores, per published checkpoint (labhamlet/wavjepa-base /
wavjepa-nat-base, /root/reference/README.md:72-108):
  * the converted flax params + the model config that interprets them,
  * the published HF model's embeddings for the seeded (1, C, 160000) input
    (the BASELINE.json numerics-parity config),
  * this runtime's embeddings at dump time.

This test replays the runtime against those vectors offline forever after:
(a) bit-level-tight against our own dump-time output — any behavior change
in conversion/windowing/encoder numerics trips it; (b) tolerance-level
against the real published model's output — permanent real-weights parity.
Auto-skips when no fixture exists (this image has no network to create one);
the fixture FORMAT itself is validated offline by the tiny-model self-test.

To create fixtures:  python scripts/check_real_weights.py --dump-fixtures
                     python scripts/check_real_weights.py --nat --dump-fixtures
"""

from pathlib import Path

import numpy as np
import pytest

FIXTURE_DIR = Path(__file__).parent / "fixtures" / "golden"
FIXTURES = sorted(FIXTURE_DIR.glob("*.npz")) if FIXTURE_DIR.exists() else []


def _config_from_meta(data):
    from wavjepa_tpu.models.jepa import JEPAConfig

    layers, dim, heads = (int(v) for v in data["__meta_encoder"])
    sr, pms = (int(v) for v in data["__meta_input"])
    channels = int(data["__meta_channels"])
    return JEPAConfig(
        conv_spec=tuple(tuple(int(x) for x in row) for row in data["__meta_conv_spec"]),
        in_channels=channels,
        extractor="conv_channel" if channels > 1 else "conv",
        pos_embed=str(data["__meta_pos_embed"]),
        encoder_layers=layers,
        encoder_dim=dim,
        encoder_heads=heads,
        sample_rate=sr,
        process_seconds=pms / 1000.0,
    )


def _replay(data, rtol_ours=1e-4, atol_ours=1e-5):
    from wavjepa_tpu.api.convert import unflatten_params_dict
    from wavjepa_tpu.api.runtime import RuntimeJEPA

    cfg = _config_from_meta(data)
    params = unflatten_params_dict(
        {k[len("param:"):]: data[k] for k in data.files if k.startswith("param:")}
    )
    audio = (
        np.random.default_rng(int(data["__meta_audio_seed"]))
        .standard_normal((1, cfg.in_channels, cfg.sample_rate * 10))
        .astype(np.float32)
    )
    rt = RuntimeJEPA(cfg, params)
    emb, ts = rt.get_timestamp_embeddings(audio)
    emb = np.asarray(emb)

    # (a) regression vs our own dump-time output (tight)
    np.testing.assert_allclose(
        emb, data["__our_embeddings"], rtol=rtol_ours, atol=atol_ours,
        err_msg="runtime output drifted from dump-time output",
    )
    # (b) parity vs the real published model (script tolerance)
    np.testing.assert_allclose(
        emb, data["__ref_embeddings"], rtol=2e-3, atol=2e-3,
        err_msg="runtime output diverges from the published HF model",
    )
    np.testing.assert_allclose(np.asarray(ts), data["__ref_timestamps"])


@pytest.mark.skipif(
    not FIXTURES,
    reason="no golden fixtures present — create with "
    "`python scripts/check_real_weights.py --dump-fixtures` on a networked machine",
)
@pytest.mark.parametrize("fixture", FIXTURES, ids=lambda p: p.stem)
def test_golden_fixture_replay(fixture):
    _replay(np.load(fixture, allow_pickle=False))


def test_fixture_format_roundtrip(tmp_path):
    """Offline self-test of the dump format: fabricate a tiny-model fixture
    exactly as check_real_weights.py writes it, then replay it."""
    import jax

    from wavjepa_tpu.api.convert import flatten_params_dict
    from wavjepa_tpu.api.runtime import RuntimeJEPA
    from wavjepa_tpu.models.jepa import JEPA, JEPAConfig

    cfg = JEPAConfig(
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
    model = JEPA(cfg)
    import jax.numpy as jnp

    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 1, cfg.target_length))
    )["params"]
    # the real dump converts with with_decoder=False — inference params
    # carry no decoder subtree; mirror that so the replayed config (which
    # doesn't record decoder dims) interprets the tree consistently
    params = {
        k: v
        for k, v in jax.tree.map(np.asarray, params).items()
        if k
        not in (
            "decoder",
            "encoder_to_decoder_mapper",
            "decoder_to_encoder_mapper",
            "mask_token",
        )
    }
    audio = (
        np.random.default_rng(0)
        .standard_normal((1, 1, cfg.sample_rate * 10))
        .astype(np.float32)
    )
    rt = RuntimeJEPA(cfg, params)
    emb, ts = rt.get_timestamp_embeddings(audio)
    fixture = tmp_path / "tiny.npz"
    np.savez_compressed(
        fixture,
        __meta_repo=np.asarray("tiny/self-test"),
        __meta_channels=np.asarray(1),
        __meta_pos_embed=np.asarray(cfg.pos_embed),
        __meta_audio_seed=np.asarray(0),
        __meta_conv_spec=np.asarray(cfg.conv_spec, np.int64),
        __meta_encoder=np.asarray(
            [cfg.encoder_layers, cfg.encoder_dim, cfg.encoder_heads], np.int64
        ),
        __meta_input=np.asarray(
            [cfg.sample_rate, int(round(cfg.process_seconds * 1000))], np.int64
        ),
        __ref_embeddings=np.asarray(emb, np.float32),  # self-parity
        __our_embeddings=np.asarray(emb, np.float32),
        __ref_timestamps=np.asarray(ts, np.float64),
        **{f"param:{k}": v for k, v in flatten_params_dict(params).items()},
    )
    _replay(np.load(fixture, allow_pickle=False))
