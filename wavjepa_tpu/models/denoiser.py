"""Denoiser: robustness distillation of WavJEPA onto noisy/reverberant scenes.

TPU-native re-design of the reference Denoiser LightningModule
(/root/reference/wavjepa/denoiser.py:44-376). The student is the JEPA
*encoder path only* (conv frontend → LayerNorm → mapper → +pos → context
encoder, no predictor/decoder); the teacher is a frozen clean-pretrained
full JEPA whose `get_audio_representation` output on the clean scene is the
regression target:

    loss = α · MSE(student(clean),  teacher(clean))
         + (1-α) · MSE(student(noisy), teacher(clean))      (denoiser.py:313-365)

Differences from the reference's structure, by design:
  * No frozen-module copy — the teacher is a parameter tree applied through
    the JEPA model functionally (train/denoise_step.py), so "frozen" is just
    "never passed to grad".
  * Scene synthesis + 32 k→16 k resample + crops + instance-norm all happen
    inside the jitted train step (ops/scenes.py, data/resample.py), not in a
    Lightning hook.

Parameter-tree compatibility: submodule names match JEPA's encoder path
(`extract_audio`, `feature_norms`, `post_extraction_mapper`, `encoder`), so a
student can be warm-started from a JEPA checkpoint by copying those subtrees
verbatim (the reference does the same via load_state_dict(strict=False),
denoise.py:195-210).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from wavjepa_tpu.models.jepa import JEPAConfig, trunc_normal_init
from wavjepa_tpu.ops.conv_frontend import ConvFeatureExtractor
from wavjepa_tpu.ops.transformer import (
    LayerNorm32,
    TransformerEncoder,
    resolve_attn_impl,
)


@dataclasses.dataclass(frozen=True)
class DenoiserConfig:
    """Mirrors the reference Denoiser hyperparameters (denoiser.py:95-148)
    plus the scene/data knobs that the fused step needs."""

    jepa: JEPAConfig = JEPAConfig()
    alpha: float = 0.0  # weight of the clean-input loss term
    original_sr: int = 32000  # scene-synthesis rate (denoiser.py:23)
    nr_samples_per_audio: int = 16
    target_seconds: float = 10.0
    # The reference logs loss_clean every step even at alpha=0 where it is
    # diagnostics-only (denoiser.py:353-365). False skips that clean-view
    # student forward entirely when alpha==0.0 — training dynamics are
    # bit-identical; only the logged diagnostic disappears.
    log_clean_loss: bool = True

    @property
    def scene_length(self) -> int:
        return int(self.original_sr * self.target_seconds)


class DenoiserStudent(nn.Module):
    """JEPA encoder path as a standalone module (denoiser.py:122-143)."""

    config: JEPAConfig

    def setup(self):
        cfg = self.config
        self.extract_audio = ConvFeatureExtractor(
            conv_spec=cfg.conv_spec,
            in_channels=cfg.in_channels,
            mode=cfg.extractor_mode,
            conv_bias=cfg.conv_bias,
            dtype=cfg.dtype,
            remat=cfg.remat,
        )
        self.feature_norms = LayerNorm32(eps=1e-5, dtype=cfg.dtype, name="feature_norms")
        self.post_extraction_mapper = (
            nn.Dense(
                cfg.encoder_dim,
                kernel_init=trunc_normal_init(0.02),
                dtype=cfg.dtype,
                name="post_extraction_mapper",
            )
            if cfg.embedding_dim != cfg.encoder_dim
            else None
        )
        self.encoder = TransformerEncoder(
            num_layers=cfg.encoder_layers,
            embed_dim=cfg.encoder_dim,
            num_heads=cfg.encoder_heads,
            mlp_dim=int(cfg.encoder_dim * cfg.mlp_ratio),
            layer_norm_eps=cfg.layer_norm_eps,
            dtype=cfg.dtype,
            remat=cfg.remat,
            attn_impl=resolve_attn_impl(cfg.attn_impl),
            name="encoder",
        )
        self.pos_encoding_encoder = jnp.asarray(self.config.pos_table(cfg.encoder_dim))

    def __call__(
        self, audio: jax.Array, padding_mask: Optional[jax.Array] = None
    ) -> jax.Array:
        """(B, C, T_samples) → (B, total_patches, D_enc) contextual features
        (denoiser.py:343-351 _forward_features + encoder_forward)."""
        x = self.extract_audio(audio)
        x = self.feature_norms(x)
        if self.post_extraction_mapper is not None:
            x = self.post_extraction_mapper(x)
        x = x + self.pos_encoding_encoder.astype(x.dtype)
        return self.encoder(x, key_padding_mask=padding_mask)


def student_params_from_jepa(jepa_params: Any) -> Any:
    """Extract the encoder-path subtree of a JEPA parameter tree for
    warm-starting a DenoiserStudent (reference load_state_dict(strict=False),
    denoise.py:195-210 / denoiser.py:149-186).

    Returns fresh buffers (not views into ``jepa_params``): the train step
    donates the student state while the teacher tree rides alongside as a
    non-donated argument, and aliased donation is a runtime InvalidArgument
    on the TPU backend.
    """
    keep = (
        "extract_audio",
        "feature_norms",
        "post_extraction_mapper",
        "encoder",
    )
    sub = {k: jepa_params[k] for k in keep if k in jepa_params}
    return jax.tree.map(jnp.copy, sub)


def denoiser_distillation_loss(
    student_clean: Optional[jax.Array],
    student_noisy: jax.Array,
    teacher_clean: jax.Array,
    alpha: float,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """α-blended full-sequence MSE (denoiser.py:353-365), f32.

    ``student_clean=None`` (only legal at alpha==0.0, see
    DenoiserConfig.log_clean_loss) skips the diagnostics-only clean term;
    loss_clean is reported as 0.
    """
    teacher = jax.lax.stop_gradient(teacher_clean.astype(jnp.float32))
    loss_dn = jnp.mean(jnp.square(student_noisy.astype(jnp.float32) - teacher))
    if student_clean is None:
        if alpha != 0.0:
            raise ValueError("student_clean may only be omitted at alpha=0.0")
        zero = jnp.float32(0)
        return loss_dn, {"loss_clean": zero, "loss_denoise_dereverb": loss_dn}
    loss_clean = jnp.mean(jnp.square(student_clean.astype(jnp.float32) - teacher))
    loss = alpha * loss_clean + (1.0 - alpha) * loss_dn
    return loss, {"loss_clean": loss_clean, "loss_denoise_dereverb": loss_dn}
