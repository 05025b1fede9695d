#!/usr/bin/env python
"""Denoise-distillation throughput: clips/sec/chip (VERDICT r2 #2).

Runs the full fused denoise step — on-device scene synthesis (RIR
fftconvolve + segmental-SNR noise mix at 32 kHz), 32 k→16 k resample of both
views, 8 shared crops/clip, student(clean)+student(noisy) fwd+bwd + frozen
teacher forward, AdamW — at the reference denoise config
(configs/trainer/denoise_audioset.yaml: batch 32 clips/GPU ×
8 samples_per_audio), on synthetic host batches.

vs_baseline derivation (BASELINE.md): the reference denoise budget is
100 000 steps × 32 clips/step/GPU within ≤24 h on H100s (denoise.sh) →
≥37.0 clips/sec/GPU if the walltime is used fully — the same
walltime-floor method as bench.py's 50.5. Prints ONE JSON line.
"""

from bench_common import emit, time_steps

BASELINE_CLIPS_PER_SEC_PER_CHIP = 100_000 * 32 / (24 * 3600)  # 37.04


def main():
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from wavjepa_tpu.models.denoiser import (
        DenoiserConfig,
        DenoiserStudent,
        student_params_from_jepa,
    )
    from wavjepa_tpu.models.jepa import JEPA
    from wavjepa_tpu.parallel.mesh import make_mesh, shard_batch
    from wavjepa_tpu.train.config import Config
    from wavjepa_tpu.train.denoise_loop import synthetic_denoise_batches
    from wavjepa_tpu.train.denoise_step import (
        DenoiseOptimizerConfig,
        DenoiseTrainState,
        make_denoise_optimizer,
        make_denoise_train_step,
    )
    from wavjepa_tpu.utils.flops import denoise_step_flops

    n_chips = len(jax.devices())
    mesh = make_mesh(n_chips)
    # reference denoise per-GPU batch (32 clips × 8 crops); BENCH_CLIPS
    # overrides clips/chip for memory/utilization experiments
    batch_clips = int(os.environ.get("BENCH_CLIPS", "32")) * n_chips
    n_crops = 8

    # build_denoise_model_config: packing off, remat auto-off when
    # microbatching. ACCUM overrides the auto accumulation (measured
    # optimum 4 at this 256-crop batch); REMAT=0 forces all remat off.
    train_cfg = Config()
    train_cfg.trainer.batch_size = batch_clips // n_chips
    train_cfg.data.samples_per_audio = n_crops
    if "ACCUM" in os.environ:
        train_cfg.trainer.accum_steps = int(os.environ["ACCUM"])
        train_cfg.explicit_keys.add("trainer.accum_steps")
    accum = train_cfg.resolved_denoise_accum_steps()
    if os.environ.get("REMAT", "1") == "0":
        train_cfg.trainer.remat = False
        train_cfg.explicit_keys.add("trainer.remat")
    jcfg = train_cfg.build_denoise_model_config()
    # LOG_CLEAN=0 skips the diagnostics-only clean student forward (exact
    # training dynamics; loss_clean not logged — models/denoiser.py)
    log_clean = os.environ.get("LOG_CLEAN", "1") != "0"
    dcfg = DenoiserConfig(
        jepa=jcfg, alpha=0.0, nr_samples_per_audio=n_crops,
        log_clean_loss=log_clean,
    )

    teacher = JEPA(jcfg)
    student = DenoiserStudent(jcfg)
    teacher_params = teacher.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 1, jcfg.target_length))
    )["params"]
    student_params = student_params_from_jepa(teacher_params)
    tx, sched = make_denoise_optimizer(DenoiseOptimizerConfig())
    state = DenoiseTrainState.create(student_params, tx)
    step = make_denoise_train_step(
        student, teacher, dcfg, tx, sched, with_rir=True, with_noise=True,
        accum_steps=accum,
    )

    batch = next(
        synthetic_denoise_batches(
            batch_clips,
            scene_len=dcfg.scene_length,
            rir_len=int(dcfg.original_sr * 2.0),
        )
    )
    batch = {k: shard_batch(mesh, jnp.asarray(v)) for k, v in batch.items()}
    teacher_params = jax.device_put(teacher_params)
    key = jax.random.PRNGKey(1)

    def run_step():
        nonlocal state
        state, metrics = step(state, teacher_params, batch, key)
        return metrics

    step_seconds, _loss = time_steps(run_step)
    emit(
        "denoise_clips_per_sec_per_chip",
        batch_clips / n_chips / step_seconds,
        step_seconds,
        denoise_step_flops(
            jcfg, n_crops * batch_clips // n_chips, alpha=dcfg.alpha,
            clean_forward=log_clean,
        ),
        baseline=BASELINE_CLIPS_PER_SEC_PER_CHIP,
        clips_per_step_per_chip=batch_clips // n_chips,
    )


if __name__ == "__main__":
    main()
