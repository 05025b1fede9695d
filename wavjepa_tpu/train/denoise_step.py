"""Fused Denoiser training step.

Everything the reference splits across dataloader workers, side-channel
noise/RIR processes, and `Denoiser.on_after_batch_transfer`
(/root/reference/wavjepa/denoiser.py:217-294) is ONE jitted XLA program:

  (clean 10-s 32 kHz batch, RIRs, faded noise, SNRs)
    → scene synthesis (FFT RIR convolution + segmental-SNR mix, ops/scenes.py)
    → Kaiser-sinc resample 32 k→16 k of both noisy and clean scenes
      (one dilated strided conv, data/resample.py)
    → 16 random 2.01-s crops/clip, shared between noisy and clean views
    → per-crop instance norm → bf16
    → student(clean), student(noisy), frozen-teacher JEPA represent(clean)
    → α-blended MSE → global-norm clip 1.0 → AdamW(lr 1e-4, wd 0,
      warmup 5 000, cosine)                       (denoiser.py:200-214, denoise.py)

The crop shuffle after flattening (denoiser.py:290-293) is dropped — a batch
permutation doesn't change loss or gradients. Teacher params are an explicit
step argument (frozen = never differentiated, never updated).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from wavjepa_tpu.data.resample import resample_jax
from wavjepa_tpu.models.denoiser import (
    DenoiserConfig,
    DenoiserStudent,
    denoiser_distillation_loss,
)
from wavjepa_tpu.models.jepa import JEPA
from wavjepa_tpu.ops.audio import instance_normalize, random_crops
from wavjepa_tpu.ops.scenes import (
    gather_scene_rirs,
    generate_scene,
    place_noise_from_bank,
    wire_to_f32,
)
from wavjepa_tpu.train.schedule import warmup_cosine_schedule


@dataclasses.dataclass(frozen=True)
class DenoiseOptimizerConfig:
    """configs/optimizer/adamW_denoise.yaml + denoise trainer flags."""

    lr: float = 1e-4
    b1: float = 0.9
    b2: float = 0.98
    eps: float = 1e-6
    weight_decay: float = 0.0
    grad_clip: float = 1.0
    warmup_steps: int = 5_000
    total_steps: int = 100_000


@struct.dataclass
class DenoiseTrainState:
    params: Any  # student (trainable)
    opt_state: optax.OptState
    step: jax.Array

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation) -> "DenoiseTrainState":
        return cls(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))


def make_denoise_optimizer(
    cfg: DenoiseOptimizerConfig,
) -> tuple[optax.GradientTransformation, Callable]:
    sched = warmup_cosine_schedule(cfg.lr, cfg.warmup_steps, cfg.total_steps)
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(
            sched, b1=cfg.b1, b2=cfg.b2, eps=cfg.eps, weight_decay=cfg.weight_decay
        ),
    )
    return tx, sched


def make_denoise_train_step(
    student: DenoiserStudent,
    teacher: JEPA,
    cfg: DenoiserConfig,
    tx: optax.GradientTransformation,
    lr_schedule: Callable,
    with_rir: bool,
    with_noise: bool,
    donate: bool = True,
    accum_steps: int = 1,
):
    """Build the jitted denoise step.

    ``accum_steps > 1`` microbatches the crop batch inside one jitted
    program (lax.scan), averaging equal-size microbatch losses/gradients —
    exact for this uniform-count MSE (same convention as train/step.py's
    JEPA accumulation; lets remat trade away its backward replays).

    Returns ``step(state, teacher_params, batch, rng[, rir_bank]) ->
    (state, metrics)`` where ``batch`` is a dict of host-assembled arrays:

      audio       (B, T32) f32|i16  clean 10-s clips at ``cfg.original_sr``
                                    (int16 wire: peak gain cancels under the
                                    per-crop instance norm, ops/scenes.wire_to_f32)
      source_rir  (B, C, L) f32     source RIRs              [if with_rir]
      noise       (B, T32) f32|i16  faded, offset-placed noise [if with_noise]
                                    (int16 wire: gain cancels in the SNR mix)
      noise_rirs  (B, N, C, L) f32  noise RIRs (zero rows ok) [if both]
      noise_start (B,) i32, noise_length (B,) i32, snr (B,) f32
      rir_index   (B,) i32          bank row per clip — replaces source_rir/
                                    noise_rirs when ``rir_bank`` (the
                                    device-resident {"source_rir": (N, C, L)
                                    [, "noise_rirs": (N, M, C, L)]} bank,
                                    shipped once) is passed
    """
    jcfg = cfg.jepa
    crop_len = jcfg.target_length
    n_crops = cfg.nr_samples_per_audio

    def step_fn(state: DenoiseTrainState, teacher_params, batch, rng, rir_bank=None):
        key = jax.random.fold_in(rng, state.step)

        audio = wire_to_f32(batch["audio"])
        source_rir, noise_rirs = batch.get("source_rir"), batch.get("noise_rirs")
        if with_rir and source_rir is None:
            source_rir, noise_rirs = gather_scene_rirs(rir_bank, batch["rir_index"])
        noise = wire_to_f32(batch.get("noise"))
        if with_noise and noise is None:
            # device noise bank: faded rows placed by a pure shift
            noise = place_noise_from_bank(
                rir_bank["noise"], batch["noise_index"], batch["noise_start"]
            )

        # --- scene synthesis at 32 kHz (ops/scenes.py) ---
        noisy = generate_scene(
            audio,
            source_rir,
            noise,
            noise_rirs,
            batch.get("noise_start"),
            batch.get("noise_length"),
            batch.get("snr"),
            with_rir=with_rir,
            with_noise=with_noise,
        )  # (B, 1, T32)
        clean = audio[:, None, :]

        # --- resample 32 k→16 k (denoiser.py:258-266) ---
        if cfg.original_sr != jcfg.sample_rate:
            noisy = resample_jax(noisy, cfg.original_sr, jcfg.sample_rate)
            clean = resample_jax(clean, cfg.original_sr, jcfg.sample_rate)

        # --- shared random crops + instance norm + bf16 (denoiser.py:267-294;
        # the same gather indices are applied to clean and noisy views) ---
        crops_noisy = random_crops(key, noisy, crop_len, n_crops)
        crops_clean = random_crops(key, clean, crop_len, n_crops)
        b, s, c, l = crops_noisy.shape
        crops_noisy = (
            instance_normalize(crops_noisy, axis=(-2, -1))
            .reshape(b * s, c, l)
            .astype(jcfg.dtype)
        )
        crops_clean = (
            instance_normalize(crops_clean, axis=(-2, -1))
            .reshape(b * s, c, l)
            .astype(jcfg.dtype)
        )

        # --- frozen teacher targets: full JEPA representation of the clean
        # view (final-normed encoder output, denoiser.py:352-356) ---
        # At the blend endpoints the dead view's gradient is exactly zero
        # (0.0 * finite == 0.0 in f32), so detaching its student forward is
        # exact — but deletes that view's entire backward pass. The reference
        # backprops zeros through it anyway (denoiser.py:353-365); alpha=0.0
        # is the shipped default, so this removes ~1/3 of the model compute.
        alpha = float(cfg.alpha)
        # log_clean_loss=False + alpha=0 drops even the clean forward —
        # loss_clean is diagnostics-only there (reported as 0).
        clean_fwd = cfg.log_clean_loss or alpha != 0.0

        def loss_fn(params, clean_mb, noisy_mb):
            targets = teacher.apply(
                {"params": teacher_params}, clean_mb, method="represent"
            )
            p_clean = jax.lax.stop_gradient(params) if alpha == 0.0 else params
            p_noisy = jax.lax.stop_gradient(params) if alpha == 1.0 else params
            out_clean = (
                student.apply({"params": p_clean}, clean_mb) if clean_fwd else None
            )
            out_noisy = student.apply({"params": p_noisy}, noisy_mb)
            return denoiser_distillation_loss(
                out_clean, out_noisy, targets, alpha
            )

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        if accum_steps > 1:
            n_rows = crops_noisy.shape[0]
            if n_rows % accum_steps:
                raise ValueError(
                    f"crop batch {n_rows} not divisible by accum_steps={accum_steps}"
                )
            mb = n_rows // accum_steps

            def split(x):
                return x.reshape((accum_steps, mb) + x.shape[1:])

            micro = (split(crops_clean), split(crops_noisy))

            def body(carry, xs):
                g_acc, l_acc, p_acc = carry
                (l, parts), g = grad_fn(state.params, *xs)
                g_acc = jax.tree.map(jnp.add, g_acc, g)
                p_acc = {k: p_acc[k] + parts[k] for k in p_acc}
                return (g_acc, l_acc + l, p_acc), None

            init = (
                jax.tree.map(jnp.zeros_like, state.params),
                jnp.float32(0),
                {
                    "loss_clean": jnp.float32(0),
                    "loss_denoise_dereverb": jnp.float32(0),
                },
            )
            (g_sum, l_sum, p_sum), _ = jax.lax.scan(body, init, micro)
            inv = 1.0 / accum_steps
            grads = jax.tree.map(lambda g: g * inv, g_sum)
            loss = l_sum * inv
            parts = {k: v * inv for k, v in p_sum.items()}
        else:
            (loss, parts), grads = grad_fn(state.params, crops_clean, crops_noisy)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        new_state = DenoiseTrainState(
            params=params, opt_state=opt_state, step=state.step + 1
        )
        metrics = {
            "loss": loss,
            "lr": lr_schedule(state.step),
            "grad_norm": optax.global_norm(grads),
            **parts,
        }
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(step_fn, donate_argnums=donate_argnums)
