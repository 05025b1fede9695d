"""Checkpoint round trip: train-state save (orbax) → HEAR runtime load →
identical representations; torch-import path covered in test_jepa_parity."""

import jax
import jax.numpy as jnp
import numpy as np

from wavjepa_tpu.api.runtime import load_model
from wavjepa_tpu.models.jepa import JEPA, JEPAConfig
from wavjepa_tpu.train.checkpoint import CheckpointManager
from wavjepa_tpu.train.state import TrainState
from wavjepa_tpu.train.step import OptimizerConfig, make_optimizer

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


def test_orbax_roundtrip_through_runtime(tmp_path):
    model = JEPA(TINY)
    rng = np.random.default_rng(0)
    audio0 = jnp.zeros((1, 1, TINY.target_length))
    params = model.init(jax.random.PRNGKey(3), audio0)["params"]
    tx, _ = make_optimizer(OptimizerConfig(warmup_steps=1, total_steps=10))
    state = TrainState.create(params, tx)

    mgr = CheckpointManager(tmp_path / "ckpt")
    assert mgr.save(1, state, force=True)
    mgr.wait()

    runtime = load_model(str(tmp_path / "ckpt"), config=TINY)
    clip = rng.standard_normal((1, TINY.sample_rate)).astype(np.float32)
    emb_loaded, _ = runtime.get_timestamp_embeddings(clip)

    direct = JEPA(TINY)
    from wavjepa_tpu.api.runtime import RuntimeJEPA

    runtime_direct = RuntimeJEPA(TINY, params)
    emb_direct, _ = runtime_direct.get_timestamp_embeddings(clip)
    np.testing.assert_allclose(emb_loaded, emb_direct, atol=1e-5)

    # resume restores the step counter
    restored = mgr.restore(state)
    assert int(restored.step) == int(state.step)


def test_torch_export_import_roundtrip():
    """flax params → torch-format state_dict → flax params is bit-exact
    (enables publishing TPU-trained weights in the reference layout)."""
    from wavjepa_tpu.api.convert import (
        convert_jepa_state_dict,
        export_jepa_state_dict,
    )

    model = JEPA(TINY)
    params = model.init(
        jax.random.PRNGKey(7), jnp.zeros((1, 1, TINY.target_length))
    )["params"]
    params = jax.tree.map(np.asarray, params)

    sd = export_jepa_state_dict(params, teacher_encoder=params["encoder"])
    assert "encoder.layers.0.self_attn.in_proj_weight" in sd
    assert "extract_audio.cnn.0.0.weight" in sd

    back, teacher = convert_jepa_state_dict(
        sd,
        encoder_layers=TINY.encoder_layers,
        decoder_layers=TINY.decoder_layers,
        conv_layers=len(TINY.conv_spec),
    )
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    for path, leaf in flat_a:
        np.testing.assert_array_equal(leaf, flat_b[path], err_msg=str(path))
    assert teacher is not None


TINY_NAT = JEPAConfig(
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
    in_channels=2,
    extractor="conv_channel",
    pos_embed="binaural",
)


def test_model_config_json_roundtrip():
    import dataclasses
    import json

    from wavjepa_tpu.models.jepa import (
        jepa_config_from_dict,
        jepa_config_to_dict,
    )

    d = json.loads(json.dumps(jepa_config_to_dict(TINY_NAT)))
    assert jepa_config_from_dict(d) == TINY_NAT  # tuples + dtype restored
    bf16 = dataclasses.replace(TINY_NAT, dtype=jnp.bfloat16)
    assert jepa_config_from_dict(jepa_config_to_dict(bf16)).dtype == jnp.bfloat16
    # unknown keys from future versions are ignored
    assert jepa_config_from_dict({**d, "new_field": 1}) == TINY_NAT


def test_sidecar_makes_load_model_reconstruct_nat_config(tmp_path):
    """A nat_binaural-trained run evaluated via hear_natjepa.load_model must
    get the binaural positional table back — the table is config-derived
    (not in params), so without the model_config.json sidecar the loader's
    default ("time") silently corrupts embeddings."""
    from wavjepa_tpu.train.checkpoint import write_model_config

    model = JEPA(TINY_NAT)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, TINY_NAT.target_length))
    )["params"]
    tx, _ = make_optimizer(OptimizerConfig(warmup_steps=1, total_steps=10))
    state = TrainState.create(params, tx)
    run_dir = tmp_path / "run"
    write_model_config(run_dir, TINY_NAT)
    mgr = CheckpointManager(run_dir / "ckpt")
    assert mgr.save(1, state, force=True)
    mgr.wait()

    for ckpt_path in (run_dir / "ckpt", run_dir / "ckpt" / "1"):
        rt = load_model(str(ckpt_path))
        assert rt.config.pos_embed == "binaural"
        assert rt.config.extractor == "conv_channel"
        assert rt.config.in_channels == 2
        assert rt.config.pack_encoder is None  # training-only field stripped
        assert rt.config.dtype == jnp.bfloat16  # inference dtype

    # explicit pos_embed overrides the sidecar
    rt = load_model(str(run_dir / "ckpt"), pos_embed="time")
    assert rt.config.pos_embed == "time"

    # explicit process_seconds overrides the sidecar — INCLUDING the
    # HEAR-standard 2.01 (None is the "trained window" sentinel, so an
    # explicit 2.01 must not be mistaken for "no override")
    rt = load_model(str(run_dir / "ckpt"), process_seconds=2.01)
    assert rt.config.process_seconds == 2.01
    rt = load_model(str(run_dir / "ckpt"))
    assert rt.config.process_seconds == TINY_NAT.process_seconds

    # embeddings actually flow with the binaural table
    rt = load_model(str(run_dir / "ckpt"))
    clip = np.random.default_rng(0).standard_normal(
        (1, 2, TINY_NAT.sample_rate), 
    ).astype(np.float32)
    emb, _ = rt.get_timestamp_embeddings(clip)
    assert np.isfinite(np.asarray(emb)).all()


def test_detect_pos_embed_from_reference_state_dict():
    import dataclasses

    from wavjepa_tpu.api.convert import detect_pos_embed

    time_cfg = dataclasses.replace(TINY_NAT, pos_embed="time")
    dim, frames, total = (
        TINY_NAT.encoder_dim,
        TINY_NAT.frames_per_window,
        TINY_NAT.total_patches,
    )
    time_sd = {"pos_encoding_encoder": time_cfg.pos_table(dim)}
    bin_sd = {"pos_encoding_encoder._orig_mod": TINY_NAT.pos_table(dim)}
    assert detect_pos_embed(time_sd, dim, frames, total) == "time"
    assert detect_pos_embed(bin_sd, dim, frames, total) == "binaural"
    assert detect_pos_embed({}, dim, frames, total) is None
    garbage = {"pos_encoding_encoder": np.ones((1, total, dim), np.float32)}
    assert detect_pos_embed(garbage, dim, frames, total) is None
    # Lightning wrapper dicts unwrap
    assert detect_pos_embed({"state_dict": time_sd}, dim, frames, total) == "time"


def test_torch_ckpt_load_detects_binaural_table(tmp_path, monkeypatch):
    """load_model on a reference-format .ckpt picks the positional table the
    checkpoint stores (export now emits it, matching the reference's frozen
    pos parameters). The probe dims are shrunk to TINY via monkeypatch so the
    detection wiring runs end-to-end at test scale; a dims mismatch (e.g. a
    base probe against this tiny table) must return None, not raise."""
    import dataclasses

    import torch

    from wavjepa_tpu.api import runtime as rt_mod
    from wavjepa_tpu.api.convert import detect_pos_embed, export_jepa_state_dict

    model = JEPA(TINY_NAT)
    params = model.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 2, TINY_NAT.target_length))
    )["params"]
    params = jax.tree.map(np.asarray, params)
    sd = export_jepa_state_dict(
        params, teacher_encoder=params["encoder"], model_config=TINY_NAT
    )
    assert "pos_encoding_encoder" in sd and "pos_encoding_decoder" in sd
    ckpt = {"state_dict": {k: torch.as_tensor(np.array(v)) for k, v in sd.items()}}
    path = tmp_path / "nat.ckpt"
    torch.save(ckpt, path)

    # direct detection at matching dims
    assert detect_pos_embed(
        ckpt["state_dict"], TINY_NAT.encoder_dim, TINY_NAT.frames_per_window,
        TINY_NAT.total_patches,
    ) == "binaural"
    # dims mismatch (base-sized probe against the tiny table): None, no raise
    base = JEPAConfig()
    assert detect_pos_embed(
        ckpt["state_dict"], base.encoder_dim, base.frames_per_window,
        base.total_patches,
    ) is None

    # end-to-end through load_model with TINY-dim probe/config construction
    allowed = {"in_channels", "extractor", "process_seconds", "pos_embed", "dtype"}

    def tiny_cfg(**kw):
        return dataclasses.replace(
            TINY_NAT, **{k: v for k, v in kw.items() if k in allowed}
        )

    monkeypatch.setattr(rt_mod, "JEPAConfig", tiny_cfg)
    rt = rt_mod.load_model(
        str(path),
        in_channels=2,
        channel_wise=True,
        process_seconds=TINY_NAT.process_seconds,
    )
    assert rt.config.pos_embed == "binaural"
    clip = np.random.default_rng(0).standard_normal(
        (1, 2, TINY_NAT.sample_rate)
    ).astype(np.float32)
    emb, _ = rt.get_timestamp_embeddings(clip)
    assert np.isfinite(np.asarray(emb)).all()
