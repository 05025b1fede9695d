#!/usr/bin/env python
"""WavJEPA-Nat binaural pretrain throughput: clips/sec/chip (VERDICT r2 #2).

Runs the full fused Nat SSL train step — on-device naturalistic scene
synthesis (noise + binaural RIR fftconvolve + SNR mix at 32 kHz), 32 k→16 k
resample, per-channel conv frontend, channel-tiled time-inverse masks,
binaural positions, student/teacher/EMA/AdamW — at the configs/
nat_binaural.yaml settings, on synthetic host batches.

vs_baseline uses the same derivation as bench.py (BASELINE.md): the
reference's SSL walltime floor of 50.5 clips/s per H100 — Nat trains under
the same 375 k-step/66 h budget (train.sh), just with binaural scenes.
Prints ONE JSON line.
"""

from bench_common import emit, time_steps


def main():
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from wavjepa_tpu.models.jepa import JEPA
    from wavjepa_tpu.parallel.mesh import make_mesh, shard_batch
    from wavjepa_tpu.train.config import load_config
    from wavjepa_tpu.train.denoise_loop import synthetic_denoise_batches
    from wavjepa_tpu.train.state import TrainState
    from wavjepa_tpu.train.step import (
        NatSceneConfig,
        make_jepa_train_step,
        make_optimizer,
    )
    from wavjepa_tpu.utils.flops import jepa_step_flops

    cfg = load_config("configs/nat_binaural.yaml")
    n_chips = len(jax.devices())
    mesh = make_mesh(n_chips)
    # Default = the reference's full 32-clip batch on one chip (same
    # convention as bench.py's 256 crops): gradient accumulation makes it
    # fit in 16 GB. Sweep (r3): 4→14.41, 16→24.74, 32→25.17 clips/s/chip.
    batch_clips = int(os.environ.get("BENCH_CLIPS", "32"))
    batch_clips *= n_chips
    n_crops = cfg.data.samples_per_audio

    # keep the auto accum/remat resolution aligned with the actual bench
    # batch (must happen before build_model_config resolves remat_decoder)
    cfg.trainer.batch_size = batch_clips // n_chips
    # ACCUM must also land before build_model_config (same reason): the
    # remat auto-resolution keys off resolved_accum_steps(), so a late
    # override would measure a remat config matching nothing in PERF.md
    if "ACCUM" in os.environ:
        cfg.trainer.accum_steps = int(os.environ["ACCUM"])
        cfg.explicit_keys.add("trainer.accum_steps")
    model_cfg = cfg.build_model_config()
    model = JEPA(model_cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.data.in_channels, model_cfg.target_length)),
    )["params"]
    tx, sched = make_optimizer(cfg.optimizer)
    state = TrainState.create(params, tx)
    masker_fn, masker_cfg = cfg.masker.build()
    scene_cfg = NatSceneConfig(
        with_rir=True, with_noise=True, n_channels=cfg.data.in_channels
    )
    accum = cfg.resolved_accum_steps()
    step = make_jepa_train_step(
        model,
        tx,
        sched,
        nr_samples_per_audio=n_crops,
        masker=masker_fn,
        masker_cfg=masker_cfg,
        ema_cfg=cfg.ema,
        scene_cfg=scene_cfg,
        accum_steps=accum,
    )

    batch = next(
        synthetic_denoise_batches(
            batch_clips,
            scene_len=int(scene_cfg.original_sr * cfg.data.target_seconds),
            rir_len=int(scene_cfg.original_sr * 2.0),
            n_channels=cfg.data.in_channels,
        )
    )
    batch = {k: shard_batch(mesh, jnp.asarray(v)) for k, v in batch.items()}
    key = jax.random.PRNGKey(1)

    def run_step():
        nonlocal state
        state, metrics = step(state, batch, key)
        return metrics

    step_seconds, _loss = time_steps(run_step)
    emit(
        "nat_pretrain_clips_per_sec_per_chip",
        batch_clips / n_chips / step_seconds,
        step_seconds,
        jepa_step_flops(model_cfg, n_crops * batch_clips // n_chips),
        clips_per_step_per_chip=batch_clips // n_chips,
    )


if __name__ == "__main__":
    main()
