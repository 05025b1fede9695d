"""End-to-end train-step tests: loss decreases, EMA moves, determinism, and
data-parallel execution over the virtual 8-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wavjepa_tpu.masking import TimeInverseMaskConfig
from wavjepa_tpu.models.jepa import JEPA, JEPAConfig
from wavjepa_tpu.parallel.mesh import make_mesh, shard_batch
from wavjepa_tpu.train.state import TrainState
from wavjepa_tpu.train.step import (
    EMAConfig,
    OptimizerConfig,
    make_jepa_train_step,
    make_optimizer,
)

TINY = JEPAConfig(
    conv_spec=((32, 10, 5), (32, 3, 2)),
    in_channels=1,
    encoder_layers=2,
    encoder_dim=32,
    encoder_heads=4,
    decoder_layers=2,
    decoder_dim=16,
    decoder_heads=4,
    sample_rate=1600,
    process_seconds=0.201,
    average_top_k_layers=2,
)

TINY_MASK = TimeInverseMaskConfig(
    target_masks_per_context=2,
    context_mask_prob=0.5,
    context_mask_length=4,
    target_prob=0.2,
    target_length=4,
    ratio_cutoff=0.1,
)


def build(batch=2, n_crops=2, steps_total=100):
    model = JEPA(TINY)
    audio = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, 1, 3200)), jnp.float32
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 1, TINY.target_length))
    )["params"]
    opt_cfg = OptimizerConfig(lr=1e-3, warmup_steps=5, total_steps=steps_total)
    tx, sched = make_optimizer(opt_cfg)
    state = TrainState.create(params, tx)
    step = make_jepa_train_step(
        model, tx, sched,
        nr_samples_per_audio=n_crops,
        masker_cfg=TINY_MASK,
        ema_cfg=EMAConfig(anneal_end_step=50),
        donate=False,
    )
    return model, state, step, audio


class TestTrainStep:
    def test_loss_decreases(self):
        _, state, step, audio = build()
        rng = jax.random.PRNGKey(42)
        losses = []
        for _ in range(12):
            state, metrics = step(state, audio, rng)
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all()
        assert np.mean(losses[-3:]) < np.mean(losses[:3])

    def test_teacher_moves_but_slower(self):
        _, state0, step, audio = build()
        rng = jax.random.PRNGKey(0)
        # warmup LR is 0 at step 0 (HF cosine-with-warmup); advance first
        for _ in range(3):
            state0, _ = step(state0, audio, rng)
        state1, _ = step(state0, audio, rng)
        # teacher changed
        t_delta = jax.tree.reduce(
            lambda a, b: a + b,
            jax.tree.map(
                lambda a, b: float(jnp.abs(a - b).sum()),
                state1.teacher_encoder,
                state0.teacher_encoder,
            ),
        )
        s_delta = jax.tree.reduce(
            lambda a, b: a + b,
            jax.tree.map(
                lambda a, b: float(jnp.abs(a - b).sum()),
                state1.params["encoder"],
                state0.params["encoder"],
            ),
        )
        assert 0 < t_delta < s_delta

    def test_deterministic(self):
        _, state, step, audio = build()
        rng = jax.random.PRNGKey(1)
        s1, m1 = step(state, audio, rng)
        s2, m2 = step(state, audio, rng)
        assert float(m1["loss"]) == float(m2["loss"])

    def test_metrics_schedule(self):
        _, state, step, audio = build()
        rng = jax.random.PRNGKey(2)
        _, m = step(state, audio, rng)
        assert float(m["lr"]) == 0.0  # step 0 of warmup
        assert 0.998 < float(m["ema_decay"]) < 1.0


class TestGradAccumulation:
    """accum_steps microbatching must be exact: same masks (full-batch key),
    loss = Σnum/Σden identical to the single pass, same optimizer update."""

    @pytest.mark.parametrize("packed", [False, True])
    def test_accum_matches_single_pass(self, packed):
        import dataclasses

        cfg = TINY
        if packed:
            cfg = dataclasses.replace(TINY, pack_encoder=16, pack_decoder=16)
        model = JEPA(cfg)
        audio = jnp.asarray(
            np.random.default_rng(3).normal(size=(2, 1, 3200)), jnp.float32
        )
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 1, cfg.target_length))
        )["params"]
        tx, sched = make_optimizer(
            OptimizerConfig(lr=1e-3, warmup_steps=1, total_steps=100)
        )

        def run(accum):
            state = TrainState.create(params, tx)
            step = make_jepa_train_step(
                model, tx, sched,
                nr_samples_per_audio=4,
                masker_cfg=TINY_MASK,
                donate=False,
                accum_steps=accum,
            )
            rng = jax.random.PRNGKey(7)
            for _ in range(2):
                state, metrics = step(state, audio, rng)
            return state, metrics

        s1, m1 = run(1)
        s2, m2 = run(2)
        np.testing.assert_allclose(
            float(m2["loss"]), float(m1["loss"]), rtol=1e-5
        )
        flat1 = jax.tree.leaves(s1.params)
        flat2 = jax.tree.leaves(s2.params)
        for a, b in zip(flat1, flat2):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5
            )

    def test_accum_rejects_indivisible(self):
        model = JEPA(TINY)
        audio = jnp.zeros((1, 1, 3200), jnp.float32)
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 1, TINY.target_length))
        )["params"]
        tx, sched = make_optimizer(OptimizerConfig())
        state = TrainState.create(params, tx)
        step = make_jepa_train_step(
            model, tx, sched, nr_samples_per_audio=3,
            masker_cfg=TINY_MASK, donate=False, accum_steps=2,
        )
        with pytest.raises(ValueError, match="divisible"):
            step(state, audio, jax.random.PRNGKey(0))


class TestDataParallel:
    @pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
    def test_8_device_mesh(self):
        mesh = make_mesh(8)
        _, state, step, _ = build(batch=8)
        audio = jnp.asarray(
            np.random.default_rng(3).normal(size=(8, 1, 3200)), jnp.float32
        )
        audio = shard_batch(mesh, audio)
        with jax.set_mesh(mesh) if hasattr(jax, "set_mesh") else mesh:
            state, metrics = step(state, audio, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))

    @pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
    def test_sharded_matches_single_device(self):
        """Same data, same key → same loss whether batch-sharded or not
        (GSPMD is semantics-preserving)."""
        mesh = make_mesh(8)
        _, state, step, _ = build(batch=8)
        audio = jnp.asarray(
            np.random.default_rng(4).normal(size=(8, 1, 3200)), jnp.float32
        )
        _, m_single = step(state, audio, jax.random.PRNGKey(5))
        _, m_shard = step(state, shard_batch(mesh, audio), jax.random.PRNGKey(5))
        np.testing.assert_allclose(
            float(m_single["loss"]), float(m_shard["loss"]), rtol=2e-5
        )


class TestInt16Wire:
    def test_int16_wire_matches_float32(self):
        """The int16 host→device wire format (data/pipeline.quantize_clip_int16)
        must train identically to the f32 path: the per-clip peak gain is
        removed exactly by the step's per-crop instance norm, leaving only
        −96 dBFS quantization noise (far below the crops' own bf16 cast)."""
        from wavjepa_tpu.data.pipeline import quantize_clip_int16

        _, state, step, audio = build(batch=4)
        a32 = np.asarray(audio)
        a16 = np.stack([quantize_clip_int16(clip) for clip in a32])
        assert a16.dtype == np.int16
        rng = jax.random.PRNGKey(7)
        _, m32 = step(state, jnp.asarray(a32), rng)
        _, m16 = step(state, jnp.asarray(a16), rng)
        np.testing.assert_allclose(
            float(m16["loss"]), float(m32["loss"]), rtol=2e-3
        )

    def test_quantize_scale_invariance(self):
        """quantize_clip_int16(g·x) == quantize_clip_int16(x) for any g>0 —
        the wire format is invariant to the host RMS normalization gain."""
        from wavjepa_tpu.data.pipeline import quantize_clip_int16

        x = np.random.default_rng(0).standard_normal((1, 500)).astype(np.float32)
        np.testing.assert_array_equal(
            quantize_clip_int16(x), quantize_clip_int16(x * 3.7)
        )
        assert quantize_clip_int16(np.zeros((1, 8), np.float32)).dtype == np.int16


class TestNatSceneStep:
    def test_nat_scene_train_step(self):
        """WavJEPA-Nat: on-device binaural scene synthesis feeds the JEPA
        step (channel extractor + channel masking + binaural positions)."""
        import numpy as np

        from wavjepa_tpu.masking import TimeInverseMaskConfig
        from wavjepa_tpu.models.jepa import JEPA, JEPAConfig
        from wavjepa_tpu.train.state import TrainState
        from wavjepa_tpu.train.step import (
            NatSceneConfig,
            OptimizerConfig,
            make_jepa_train_step,
            make_optimizer,
        )

        cfg = JEPAConfig(
            conv_spec=((16, 10, 5), (16, 3, 2)),
            encoder_layers=2, encoder_dim=32, encoder_heads=4,
            decoder_layers=1, decoder_dim=16, decoder_heads=4,
            sample_rate=1600, process_seconds=0.201,
            average_top_k_layers=2,
            in_channels=2, extractor="conv_channel", pos_embed="binaural",
        )
        model = JEPA(cfg)
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 2, cfg.target_length))
        )["params"]
        tx, sched = make_optimizer(OptimizerConfig(warmup_steps=2, total_steps=10))
        state = TrainState.create(params, tx)
        scene_cfg = NatSceneConfig(n_channels=2, original_sr=3200)
        step = make_jepa_train_step(
            model, tx, sched, nr_samples_per_audio=2,
            masker_cfg=TimeInverseMaskConfig(
                target_masks_per_context=2, context_mask_prob=0.5,
                context_mask_length=4, target_prob=0.2, target_length=4,
                channel_based_masking=True,
            ),
            scene_cfg=scene_cfg, donate=False,
        )
        rng = np.random.default_rng(0)
        b, t32 = 2, 3200
        rirs = np.zeros((b, 2, 320), np.float32)
        rirs[:, :, 0] = 1.0
        nrirs = np.zeros((b, 3, 2, 320), np.float32)
        nrirs[:, 0, :, 0] = 1.0
        batch = {
            "audio": jnp.asarray(rng.standard_normal((b, t32)), jnp.float32),
            "source_rir": jnp.asarray(rirs),
            "noise": jnp.asarray(rng.standard_normal((b, t32)), jnp.float32),
            "noise_rirs": jnp.asarray(nrirs),
            "noise_start": jnp.zeros((b,), jnp.int32),
            "noise_length": jnp.full((b,), t32, jnp.int32),
            "snr": jnp.zeros((b,), jnp.float32),
        }
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
        assert int(state.step) == 1

        # RIR-bank + int16-wire variant of the SAME batch must reproduce the
        # loss (bank gather is exact; wire noise is −96 dBFS, VERDICT r4 #1).
        # The state already advanced one step, so re-run both forms at the
        # advanced state and compare to each other.
        from wavjepa_tpu.data.pipeline import quantize_clip_int16

        bank_rng = np.random.default_rng(3)
        bank = {
            "source_rir": bank_rng.standard_normal((4, 2, 320)).astype(np.float32),
            "noise_rirs": bank_rng.standard_normal((4, 3, 2, 320)).astype(
                np.float32
            ),
        }
        idx = np.asarray([2, 0], np.int32)
        bank["source_rir"][idx] = np.asarray(batch["source_rir"])
        bank["noise_rirs"][idx] = np.asarray(batch["noise_rirs"])
        banked = {
            k: v for k, v in batch.items() if k not in ("source_rir", "noise_rirs")
        }
        banked["rir_index"] = jnp.asarray(idx)
        banked["audio"] = jnp.asarray(
            np.stack([quantize_clip_int16(c) for c in np.asarray(batch["audio"])])
        )
        banked["noise"] = jnp.asarray(
            np.stack([quantize_clip_int16(c) for c in np.asarray(batch["noise"])])
        )
        bank = {k: jnp.asarray(v) for k, v in bank.items()}
        _, m_inline = step(state, batch, jax.random.PRNGKey(2))
        _, m_banked = step(state, banked, jax.random.PRNGKey(2), bank)
        np.testing.assert_allclose(
            float(m_banked["loss"]), float(m_inline["loss"]), rtol=2e-3
        )
