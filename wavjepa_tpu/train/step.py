"""Fused JEPA training step.

Everything the reference splits across CPU dataloader workers, Lightning's
`on_after_batch_transfer` and the module forward
(/root/reference/wavjepa/jepa.py:275-333) is ONE jitted XLA program here:

  raw 10-s waveform batch
    → 8 random 2.01-s crops/clip (single gather)
    → per-crop instance norm → bf16
    → on-device block-mask sampling (static shapes)
    → conv frontend + context encoder + predictor
    → EMA-teacher targets (top-k layer average, instance-normed)
    → masked MSE
    → global-norm clip 5.0 → AdamW(β=(0.9,0.98), eps 1e-6, wd 0.04)
    → f32 EMA update of the teacher encoder.

Dropped relative to the reference, with reason:
  * the post-flatten random shuffle of crops (jepa.py:313-316) — a batch
    permutation is a no-op for loss and gradients (no cross-sample ops);
  * host-side mask precomputation — masks are sampled on device from the
    step key, which removes the reference's biggest CPU bottleneck.

Data parallelism: the step is GSPMD-agnostic — place `audio` with a
batch sharding from `parallel/mesh.py` and XLA adds the ICI all-reduce.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from wavjepa_tpu.data.resample import resample_jax
from wavjepa_tpu.masking import TimeInverseMaskConfig, time_inverse_block_masks
from wavjepa_tpu.models.jepa import JEPA, masked_prediction_loss
from wavjepa_tpu.ops.audio import instance_normalize, random_crops
from wavjepa_tpu.ops.scenes import (
    gather_scene_rirs,
    generate_scene,
    place_noise_from_bank,
    wire_to_f32,
)
from wavjepa_tpu.train.schedule import ema_decay_schedule, warmup_cosine_schedule
from wavjepa_tpu.train.state import TrainState, ema_update


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    """configs/optimizer/adamW.yaml + Lightning trainer flags."""

    lr: float = 4e-4
    b1: float = 0.9
    b2: float = 0.98
    eps: float = 1e-6
    weight_decay: float = 0.04
    grad_clip: float = 5.0
    warmup_steps: int = 100_000
    total_steps: int = 375_000


@dataclasses.dataclass(frozen=True)
class NatSceneConfig:
    """On-device naturalistic-scene synthesis for WavJEPA-Nat pretraining:
    the step receives raw (audio, RIRs, noise, SNR) batches and builds
    multi-channel (binaural/ambisonic) scenes before cropping — the data
    path the reference describes for Nat (SURVEY.md §1 item 2) fused into
    the train step like everything else."""

    with_rir: bool = True
    with_noise: bool = True
    n_channels: int = 2  # 2 = binaural, 4 = ambisonic
    original_sr: int = 32000  # scene-synthesis rate


@dataclasses.dataclass(frozen=True)
class EMAConfig:
    start_decay: float = 0.999
    end_decay: float = 0.99999
    anneal_end_step: int = 100_000


def make_optimizer(cfg: OptimizerConfig) -> tuple[optax.GradientTransformation, Callable]:
    sched = warmup_cosine_schedule(cfg.lr, cfg.warmup_steps, cfg.total_steps)
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(
            sched, b1=cfg.b1, b2=cfg.b2, eps=cfg.eps, weight_decay=cfg.weight_decay
        ),
    )
    return tx, sched


MaskerFn = Callable[..., tuple[jax.Array, jax.Array, jax.Array]]


def jepa_loss_fn(
    model: JEPA,
    params: Any,
    teacher_encoder: Any,
    crops: jax.Array,
    ctx_mask: jax.Array,
    target_masks: jax.Array,
    visible_masks: jax.Array,
    return_terms: bool = False,
):
    """Student prediction loss against stop-gradient EMA-teacher targets.

    ``return_terms`` yields the unreduced (numerator, denominator) pair so
    gradient accumulation can reproduce the reference's whole-batch
    normalizer exactly (loss = Σnum_i / Σden_i; den is param-independent,
    so grads = Σ∇num_i / Σden_i)."""
    feats = model.apply({"params": params}, crops, method="encode_features")
    teacher_params = dict(params)
    teacher_params["encoder"] = teacher_encoder
    targets = model.apply(
        {"params": teacher_params},
        jax.lax.stop_gradient(feats),
        method="teacher_forward",
    )
    targets = jax.lax.stop_gradient(targets)
    if model.config.pack_encoder is not None:
        # packed-space loss: gathers targets into the packed layout instead
        # of scattering predictions to the full grid (models/jepa.py)
        return model.apply(
            {"params": params},
            feats,
            ctx_mask,
            visible_masks,
            targets,
            target_masks,
            method="packed_prediction_loss",
            return_terms=return_terms,
        )
    preds = model.apply(
        {"params": params}, feats, ctx_mask, visible_masks, method="student_forward"
    )
    return masked_prediction_loss(preds, targets, target_masks, return_terms)


def make_jepa_train_step(
    model: JEPA,
    tx: optax.GradientTransformation,
    lr_schedule: Callable,
    nr_samples_per_audio: int = 8,
    masker: Optional[MaskerFn] = None,
    masker_cfg: Any = None,
    ema_cfg: EMAConfig = EMAConfig(),
    scene_cfg: Optional[NatSceneConfig] = None,
    donate: bool = True,
    return_grads: bool = False,
    accum_steps: int = 1,
):
    """Build the jitted train step.

    Returns ``train_step(state, audio, rng) -> (state, metrics)`` where
    ``audio`` is (B, C, samples) f32 (10-s clips) and ``rng`` is a base key
    folded with the step counter (safe to pass the same key every call).
    With ``scene_cfg`` (WavJEPA-Nat), ``audio`` is instead a dict batch like
    the denoise step's (audio/source_rir/noise/noise_rirs/... at
    ``scene_cfg.original_sr``) and multi-channel scenes are synthesized
    on device before cropping.

    ``accum_steps > 1`` splits the crop batch into that many sequential
    microbatches inside the SAME jitted program (lax.scan), accumulating
    loss-numerator gradients and dividing by the global target count at the
    end — mathematically identical to the single-pass step (the reference's
    whole-batch mean normalizer, jepa.py:335-362) while only ever holding
    one microbatch's activations, which lets decoder remat turn off at the
    full 256-crop bench batch (the backward's decoder replay is the largest
    non-floor term in PERF.md's round-3 accounting).
    """
    cfg = model.config
    masker = masker or time_inverse_block_masks
    masker_cfg = masker_cfg if masker_cfg is not None else TimeInverseMaskConfig()
    ema_sched = ema_decay_schedule(
        ema_cfg.start_decay, ema_cfg.end_decay, ema_cfg.anneal_end_step
    )
    crop_len = cfg.target_length
    total_patches = cfg.total_patches

    def step_fn(state: TrainState, audio: jax.Array, rng: jax.Array, rir_bank=None):
        key = jax.random.fold_in(rng, state.step)
        k_crop, k_mask = jax.random.split(key)

        # --- fused batch prep (reference on_after_batch_transfer) ---
        if scene_cfg is not None:
            batch = audio  # dict batch (see docstring)
            source_rir, noise_rirs = batch.get("source_rir"), batch.get("noise_rirs")
            if scene_cfg.with_rir and source_rir is None:
                # device-resident RIR bank: per-clip int32 rows instead of
                # re-shipping ~3 MB of f32 RIRs per clip (ops/scenes.py)
                source_rir, noise_rirs = gather_scene_rirs(
                    rir_bank, batch["rir_index"]
                )
            noise = wire_to_f32(batch.get("noise"))
            if scene_cfg.with_noise and noise is None:
                # device noise bank: faded rows placed by a pure shift
                noise = place_noise_from_bank(
                    rir_bank["noise"], batch["noise_index"], batch["noise_start"]
                )
            audio = generate_scene(
                wire_to_f32(batch["audio"]),
                source_rir,
                noise,
                noise_rirs,
                batch.get("noise_start"),
                batch.get("noise_length"),
                batch.get("snr"),
                with_rir=scene_cfg.with_rir,
                with_noise=scene_cfg.with_noise,
                n_channels=scene_cfg.n_channels,
            )  # (B, C, T_orig)
            if scene_cfg.original_sr != cfg.sample_rate:
                audio = resample_jax(audio, scene_cfg.original_sr, cfg.sample_rate)
        # int16 wire format (data/pipeline.quantize_clip_int16): 4× less
        # host→device traffic; cast on device. The 1/32767 rescale keeps
        # pre-norm magnitudes comparable and is itself removed by the
        # per-crop instance norm below.
        audio = wire_to_f32(audio)
        if audio.ndim == 2:
            audio = audio[:, None, :]
        crops = random_crops(k_crop, audio, crop_len, nr_samples_per_audio)
        crops = instance_normalize(crops, axis=(-2, -1))
        b, s, c, l = crops.shape
        crops = crops.reshape(b * s, c, l).astype(cfg.dtype)

        # --- on-device masks ---
        ctx_mask, target_masks, visible_masks = masker(
            k_mask, batch_size=b * s, n_times=total_patches,
            in_channels=cfg.in_channels, cfg=masker_cfg,
        )
        if cfg.pack_encoder is not None:
            # canonicalize for visible-token packing: flip context-visible
            # tokens beyond the pack_encoder budget back to masked
            # (positionally-last excess; never observed at the AudioSet
            # config — max 87 visible over 82k samples vs the budget of 88 —
            # but required for the packed gather to stay exact). Targets live in
            # the masked region, so the XOR-rebuilt visibility stays
            # consistent (reference masking.py:116 convention).
            chans = cfg.in_channels if masker_cfg.channel_based_masking else 1
            if chans > 1:
                # channel-tiled masks are identical per channel (channel-
                # major layout, maskers._tile_channels); a flat cumsum would
                # flip only trailing-channel copies and break that
                # invariant, so cut per channel at the per-channel budget.
                vis = (~ctx_mask).reshape(ctx_mask.shape[0], chans, -1)
                over = (
                    jnp.cumsum(vis, axis=-1) > cfg.pack_encoder // chans
                ).reshape(ctx_mask.shape)
            else:
                over = jnp.cumsum(~ctx_mask, axis=-1) > cfg.pack_encoder
            ctx_mask = ctx_mask | over
            visible_masks = jnp.logical_xor(ctx_mask[:, None, :], target_masks)

        # --- loss, grads, update ---
        if accum_steps > 1:
            n_rows = crops.shape[0]
            if n_rows % accum_steps:
                raise ValueError(
                    f"crop batch {n_rows} not divisible by accum_steps={accum_steps}"
                )
            mb = n_rows // accum_steps

            def split(x):
                return x.reshape((accum_steps, mb) + x.shape[1:])

            micro = jax.tree.map(
                split, (crops, ctx_mask, target_masks, visible_masks)
            )

            def num_fn(params, mcrops, mctx, mtgt, mvis):
                num, den = jepa_loss_fn(
                    model, params, state.teacher_encoder,
                    mcrops, mctx, mtgt, mvis, return_terms=True,
                )
                return num, den

            grad_fn = jax.value_and_grad(num_fn, has_aux=True)

            def body(carry, xs):
                g_acc, num_acc, den_acc = carry
                (num, den), g = grad_fn(state.params, *xs)
                g_acc = jax.tree.map(jnp.add, g_acc, g)
                return (g_acc, num_acc + num, den_acc + den), None

            zeros = jax.tree.map(jnp.zeros_like, state.params)
            (g_sum, num_sum, den_sum), _ = jax.lax.scan(
                body, (zeros, jnp.float32(0), jnp.float32(0)), micro
            )
            inv = 1.0 / (den_sum + 1e-8)
            grads = jax.tree.map(lambda g: g * inv, g_sum)
            loss = num_sum * inv
        else:
            loss, grads = jax.value_and_grad(jepa_loss_fn, argnums=1)(
                model, state.params, state.teacher_encoder,
                crops, ctx_mask, target_masks, visible_masks,
            )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        # --- EMA teacher step (pre-update student weights, like the
        # reference where _step_teacher runs inside training_step before the
        # optimizer update, jepa.py:330-332) ---
        decay = ema_sched(state.step)
        teacher = ema_update(state.teacher_encoder, state.params["encoder"], decay)

        new_state = TrainState(
            params=params,
            teacher_encoder=teacher,
            opt_state=opt_state,
            step=state.step + 1,
        )
        metrics = {
            "loss": loss,
            "ema_decay": decay,
            "lr": lr_schedule(state.step),
            "grad_norm": optax.global_norm(grads),
        }
        if return_grads:
            # per-leaf gradient tree for parallelism-equivalence gates
            # (__graft_entry__ DP-vs-TP allclose); never set in production
            metrics["grads"] = grads
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(step_fn, donate_argnums=donate_argnums)
