"""Visible-token packing equivalence: the packed student_forward
(JEPAConfig.pack_encoder/pack_decoder) must reproduce the unpacked path at
every position the training loss reads (targets), and the train step with
packing must produce the same loss as without."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wavjepa_tpu.masking import TimeInverseMaskConfig, time_inverse_block_masks
from wavjepa_tpu.models.jepa import JEPA, JEPAConfig, masked_prediction_loss

BASE = JEPAConfig(
    conv_spec=((32, 10, 5), (32, 3, 2), (32, 2, 2)),
    encoder_layers=2,
    encoder_dim=64,
    encoder_heads=4,
    decoder_layers=2,
    decoder_dim=32,
    decoder_heads=4,
    sample_rate=16000,
    process_seconds=0.201,  # 3216 samples → 160 patches
    average_top_k_layers=2,
    remat=False,
)
T = BASE.total_patches
MASK_CFG = TimeInverseMaskConfig()


def _masks(batch, key=0, pack_encoder=None):
    ctx, tgt, vis = time_inverse_block_masks(
        jax.random.PRNGKey(key), batch_size=batch, n_times=T, cfg=MASK_CFG
    )
    if pack_encoder is not None:
        over = jnp.cumsum(~ctx, axis=-1) > pack_encoder
        ctx = ctx | over
        vis = jnp.logical_xor(ctx[:, None, :], tgt)
    return ctx, tgt, vis


class TestPackedStudentForward:
    def setup_method(self):
        self.model_full = JEPA(BASE)
        pe = 96 if T >= 96 else T
        pd = min(T, pe + 60)
        self.packed_cfg = dataclasses.replace(
            BASE, pack_encoder=pe, pack_decoder=pd
        )
        self.model_packed = JEPA(self.packed_cfg)
        key = jax.random.PRNGKey(0)
        self.params = self.model_full.init(
            key, jnp.zeros((1, 1, BASE.target_length))
        )["params"]
        self.pe = pe

    def test_packed_matches_unpacked_at_targets(self):
        b = 4
        rng = np.random.default_rng(0)
        audio = rng.normal(size=(b, 1, BASE.target_length)).astype(np.float32)
        ctx, tgt, vis = _masks(b, key=1, pack_encoder=self.pe)
        # precondition for exact packing
        assert int(jnp.max(jnp.sum(~ctx, -1))) <= self.packed_cfg.pack_encoder
        assert int(jnp.max(jnp.sum(~vis, -1))) <= self.packed_cfg.pack_decoder

        feats = self.model_full.apply(
            {"params": self.params}, jnp.asarray(audio), method="encode_features"
        )
        ref = self.model_full.apply(
            {"params": self.params}, feats, ctx, vis, method="student_forward"
        )
        packed = self.model_packed.apply(
            {"params": self.params}, feats, ctx, vis, method="student_forward"
        )
        ref, packed = np.asarray(ref, np.float64), np.asarray(packed, np.float64)
        tmask = np.asarray(tgt)
        # at target positions (what the loss reads) the packed path is the
        # same computation over the same visible key sets
        np.testing.assert_allclose(
            packed[tmask], ref[tmask], atol=2e-5, rtol=1e-4
        )
        # everywhere outside the pack the packed path returns zeros — and
        # the loss must agree exactly
        targets = self.model_full.apply(
            {"params": self.params}, feats, method="teacher_forward"
        )
        l_ref = float(masked_prediction_loss(jnp.asarray(ref), targets, tgt))
        l_pack = float(masked_prediction_loss(jnp.asarray(packed), targets, tgt))
        assert abs(l_ref - l_pack) < 1e-5 * max(1.0, abs(l_ref))

    def test_canonicalization_bounds_visible(self):
        ctx, tgt, vis = _masks(64, key=2, pack_encoder=24)
        assert int(jnp.max(jnp.sum(~ctx, -1))) <= 24
        # targets untouched by canonicalization
        _, tgt0, _ = _masks(64, key=2, pack_encoder=None)
        assert bool(jnp.all(tgt == tgt0))
        # convention invariant: vis = ctx XOR tgt
        assert bool(jnp.all(vis == (ctx[:, None, :] ^ tgt)))

    def test_train_step_loss_matches_unpacked(self):
        from wavjepa_tpu.train.state import TrainState
        from wavjepa_tpu.train.step import (
            OptimizerConfig,
            make_jepa_train_step,
            make_optimizer,
        )

        audio = np.random.default_rng(3).normal(size=(2, 1, 16000)).astype(
            np.float32
        )
        losses = []
        for cfg in (BASE, self.packed_cfg):
            model = JEPA(cfg)
            tx, sched = make_optimizer(OptimizerConfig())
            state = TrainState.create(self.params, tx)
            step = make_jepa_train_step(
                model, tx, sched, nr_samples_per_audio=2, masker_cfg=MASK_CFG,
                donate=False,
            )
            _, metrics = step(state, jnp.asarray(audio), jax.random.PRNGKey(7))
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all()
        # same key → same crops/masks; packing is numerics-equivalent
        assert abs(losses[0] - losses[1]) < 5e-4 * max(1.0, abs(losses[0])), losses


class TestPackedChannelTiled:
    """Packing under channel-based masking (WavJEPA-Nat): masks are tiled
    channel-major over C·T tokens; the packed gather operates on the
    flattened token axis and must match the unpacked path."""

    def test_packed_matches_unpacked_binaural(self):
        cfg_full = dataclasses.replace(
            BASE,
            in_channels=2,
            extractor="conv_channel",
            pos_embed="binaural",
        )
        t_total = cfg_full.total_patches
        t_per = t_total // 2
        pe_per = 96 if t_per >= 96 else t_per
        pd_per = min(t_per, pe_per + 60)
        cfg_packed = dataclasses.replace(
            cfg_full, pack_encoder=2 * pe_per, pack_decoder=2 * pd_per
        )
        model_full, model_packed = JEPA(cfg_full), JEPA(cfg_packed)
        key = jax.random.PRNGKey(0)
        params = model_full.init(
            key, jnp.zeros((1, 2, cfg_full.target_length))
        )["params"]

        mask_cfg = dataclasses.replace(MASK_CFG, channel_based_masking=True)
        ctx, tgt, vis = time_inverse_block_masks(
            jax.random.PRNGKey(5), batch_size=3, n_times=t_total,
            in_channels=2, cfg=mask_cfg,
        )
        over = jnp.cumsum(~ctx, axis=-1) > cfg_packed.pack_encoder
        ctx = ctx | over
        vis = jnp.logical_xor(ctx[:, None, :], tgt)
        assert int(jnp.max(jnp.sum(~vis, -1))) <= cfg_packed.pack_decoder

        audio = np.random.default_rng(2).normal(
            size=(3, 2, cfg_full.target_length)
        ).astype(np.float32)
        feats = model_full.apply(
            {"params": params}, jnp.asarray(audio), method="encode_features"
        )
        ref = model_full.apply(
            {"params": params}, feats, ctx, vis, method="student_forward"
        )
        packed = model_packed.apply(
            {"params": params}, feats, ctx, vis, method="student_forward"
        )
        tmask = np.asarray(tgt)
        np.testing.assert_allclose(
            np.asarray(packed)[tmask], np.asarray(ref)[tmask], atol=2e-5, rtol=1e-4
        )
