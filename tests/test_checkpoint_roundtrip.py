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
