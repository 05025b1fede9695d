"""Denoiser training driver: teacher load, student warm-start, step loop.

TPU-native counterpart of the reference denoise CLI
(/root/reference/denoise.py:39-225): loads a WavJEPA-Clean checkpoint, maps
its weights into BOTH the frozen teacher (full JEPA) and the student encoder
path, then runs the fused denoise step (train/denoise_step.py) over the
scene batches. Checkpoints every 2.5 k steps (denoise.py:94-102); resume via
orbax latest-step restore.
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterator, Optional

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
from wavjepa_tpu.train.checkpoint import (
    CheckpointManager,
    import_torch_jepa,
    write_model_config,
)
from wavjepa_tpu.train.config import Config
from wavjepa_tpu.train.denoise_step import (
    DenoiseOptimizerConfig,
    DenoiseTrainState,
    make_denoise_optimizer,
    make_denoise_train_step,
)
from wavjepa_tpu.utils.metrics import MetricLogger, Throughput


def load_teacher_params(ckpt_path: str, model: JEPA):
    """Full JEPA params from an orbax dir or a reference torch .ckpt
    (`_orig_mod`-aware), filled from init for any missing subtree."""
    template = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, model.config.in_channels, model.config.target_length)),
    )["params"]
    if not ckpt_path:
        return template
    path = Path(ckpt_path)
    if path.is_dir():
        mgr = CheckpointManager(path.parent if path.name.isdigit() else path)
        restored = mgr.restore_raw(int(path.name) if path.name.isdigit() else None)
        restored = restored.get("params", restored)
        return {**template, **restored}
    params, _ = import_torch_jepa(str(path), model.config)
    return {**template, **params}


def synthetic_denoise_batches(
    batch_size: int,
    scene_len: int,
    rir_len: int,
    max_noise: int = 5,
    with_rir: bool = True,
    with_noise: bool = True,
    n_channels: int = 1,
    seed: int = 0,
) -> Iterator[dict[str, np.ndarray]]:
    """Random scene batches for smoke tests and benchmarks. ``n_channels``
    sizes the RIR channel axis (2 = binaural Nat scenes)."""
    rng = np.random.default_rng(seed)
    c = n_channels
    while True:
        batch = {
            "audio": rng.standard_normal((batch_size, scene_len)).astype(np.float32)
        }
        if with_rir:
            rir = np.zeros((batch_size, c, rir_len), np.float32)
            rir[:, :, 0] = 1.0
            rir[:, :, 1:200] = 0.05 * rng.standard_normal((batch_size, c, 199))
            batch["source_rir"] = rir
        if with_noise:
            batch["noise"] = rng.standard_normal(
                (batch_size, scene_len)
            ).astype(np.float32)
            batch["noise_start"] = np.zeros((batch_size,), np.int32)
            batch["noise_length"] = np.full((batch_size,), scene_len, np.int32)
            batch["snr"] = rng.uniform(-5, 5, (batch_size,)).astype(np.float32)
            if with_rir:
                nr = np.zeros((batch_size, max_noise, c, rir_len), np.float32)
                nr[:, :, :, 0] = 1.0
                batch["noise_rirs"] = nr
        yield batch


def effective_scene_flags(cfg: Config) -> tuple[bool, bool]:
    """(with_rir, with_noise) that the BATCHES will actually carry: real-data
    runs need the rir/noise shard dirs to be set, synthetic runs don't —
    keeps the jitted step's static flags consistent with the data source."""
    synthetic = cfg.data.synthetic or not cfg.data.data_dirs
    with_rir = cfg.data.with_rir and (synthetic or bool(cfg.data.rir_dir))
    with_noise = cfg.data.with_noise and (synthetic or bool(cfg.data.noise_dir))
    return with_rir, with_noise


def build_denoise_data_iterator(
    cfg: Config,
) -> tuple[Iterator[dict[str, np.ndarray]], Optional[dict]]:
    """Returns (batch iterator, host RIR bank or None). The bank (when the
    real-data pipeline runs with ``data.rir_bank_size > 0``) is shipped to
    the device once by the caller; batches then carry per-clip ``rir_index``
    (+ a ``rir_bank_refresh`` payload) instead of inline RIRs."""
    dcfg = DenoiserConfig(jepa=cfg.build_denoise_model_config(), alpha=cfg.alpha)
    with_rir, with_noise = effective_scene_flags(cfg)
    if cfg.data.synthetic or not cfg.data.data_dirs:
        return synthetic_denoise_batches(
            cfg.trainer.batch_size,
            scene_len=dcfg.scene_length,
            rir_len=int(dcfg.original_sr * 2.0),
            with_rir=with_rir,
            with_noise=with_noise,
            n_channels=cfg.data.in_channels if cfg.data.nat_scenes else 1,
            seed=cfg.trainer.seed,
        ), None
    from wavjepa_tpu.data.denoise_pipeline import (
        DenoiseSampleSource,
        denoise_batches,
    )

    source = DenoiseSampleSource(
        cfg.data.data_dirs,
        rir_pattern=cfg.data.rir_dir if with_rir else None,
        noise_pattern=cfg.data.noise_dir if with_noise else None,
        sr=32000,
        target_seconds=cfg.data.target_seconds,
        snr_low=cfg.data.snr_low,
        snr_high=cfg.data.snr_high,
        num_workers=cfg.data.num_workers,
        host_id=jax.process_index(),
        num_hosts=jax.process_count(),
        seed=cfg.trainer.seed,
        transfer_dtype=cfg.data.transfer_dtype,
        rir_bank_size=cfg.data.rir_bank_size if with_rir else 0,
        noise_bank_size=cfg.data.noise_bank_size if with_noise else 0,
    )
    return (
        denoise_batches(
            source,
            cfg.trainer.batch_size,
            refresh_rirs_per_batch=cfg.data.rir_refresh_per_batch,
        ),
        source.scene_bank(),
    )


def train_denoiser(
    cfg: Config,
    data_iter: Optional[Iterator[dict[str, np.ndarray]]] = None,
    max_steps: Optional[int] = None,
) -> DenoiseTrainState:
    """Run (or resume) denoise distillation. Returns the final state."""
    mesh = make_mesh(
        cfg.trainer.num_devices or None, model_parallel=cfg.trainer.model_parallel
    )
    n_chips = int(np.prod(mesh.devices.shape))

    jcfg = cfg.build_denoise_model_config()
    dcfg = DenoiserConfig(
        jepa=jcfg, alpha=cfg.alpha,
        nr_samples_per_audio=cfg.data.samples_per_audio,
        target_seconds=cfg.data.target_seconds,
        log_clean_loss=cfg.log_clean_loss,
    )
    teacher = JEPA(jcfg)
    student = DenoiserStudent(jcfg)

    teacher_params = jax.device_put(load_teacher_params(cfg.teacher_ckpt, teacher))
    # student warm-start = the teacher's encoder path (denoise.py:195-210);
    # student_params_from_jepa copies, so donation can't alias the teacher tree
    student_params = student_params_from_jepa(teacher_params)

    opt_cfg = DenoiseOptimizerConfig(
        lr=cfg.optimizer.lr,
        b1=cfg.optimizer.b1,
        b2=cfg.optimizer.b2,
        eps=cfg.optimizer.eps,
        weight_decay=cfg.optimizer.weight_decay,
        grad_clip=cfg.optimizer.grad_clip,
        # Denoise warmup/total defaults (5k / trainer.steps) apply only when
        # the user left the SSL pretraining defaults (100k/375k — nonsense
        # for a distillation run) AND didn't set the fields explicitly
        # (cfg.explicit_keys tracks YAML/CLI-set keys) — a user who
        # explicitly asks for exactly 100k/375k keeps those values.
        warmup_steps=(
            min(5_000, cfg.trainer.steps)
            if (
                (cfg.optimizer.warmup_steps, cfg.optimizer.total_steps)
                == (100_000, 375_000)
                and "optimizer.warmup_steps" not in cfg.explicit_keys
            )
            else cfg.optimizer.warmup_steps
        ),
        total_steps=(
            cfg.trainer.steps
            if (
                (cfg.optimizer.warmup_steps, cfg.optimizer.total_steps)
                == (100_000, 375_000)
                and "optimizer.total_steps" not in cfg.explicit_keys
            )
            else cfg.optimizer.total_steps
        ),
    )
    tx, lr_sched = make_denoise_optimizer(opt_cfg)
    state = DenoiseTrainState.create(student_params, tx)
    with_rir, with_noise = effective_scene_flags(cfg)
    step_fn = make_denoise_train_step(
        student, teacher, dcfg, tx, lr_sched,
        with_rir=with_rir, with_noise=with_noise,
        accum_steps=cfg.resolved_denoise_accum_steps(),
    )

    run_dir = Path(cfg.trainer.save_dir) / ("Denoise-" + cfg.run_identity())
    write_model_config(run_dir, jcfg)
    ckpt = CheckpointManager(
        run_dir / "ckpt", keep=cfg.trainer.keep_ckpts,
        every=min(cfg.trainer.ckpt_every, 2_500),
    )
    if ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        print(f"resumed from step {int(state.step)}", flush=True)

    logger = MetricLogger(str(run_dir / "tb"))
    bank_host = None
    if data_iter is None:
        data_iter, bank_host = build_denoise_data_iterator(cfg)
    total = max_steps if max_steps is not None else cfg.trainer.steps
    clips_per_step = cfg.trainer.batch_size * cfg.data.samples_per_audio
    throughput = Throughput(clips_per_step, n_chips)

    rng = jax.random.PRNGKey(cfg.trainer.seed + 1)
    throughput.start()
    # host-side step counter — see train/loop.py: fetching state.step every
    # iteration would stall async dispatch
    from wavjepa_tpu.train.loop import prefetch_to_device

    from wavjepa_tpu.ops.scenes import update_rir_bank
    from wavjepa_tpu.parallel.mesh import replicated

    rir_bank = (
        jax.device_put(bank_host, replicated(mesh)) if bank_host is not None else None
    )
    step = int(state.step)
    device_iter = prefetch_to_device(data_iter, mesh)
    for _ in range(step, total):
        batch = next(device_iter)
        refresh = batch.pop("rir_bank_refresh", None)
        if refresh is not None:
            rir_bank = update_rir_bank(rir_bank, refresh["slots"], refresh["rows"])
        state, metrics = step_fn(state, teacher_params, batch, rng, rir_bank)
        step += 1
        if step % cfg.trainer.log_every == 0 or step == total:
            vals = {k: float(v) for k, v in metrics.items()}
            vals.update(throughput.step())
            logger.log(step, vals)
        else:
            throughput.step()
        if ckpt.save(step, state):
            print(f"checkpoint @ {step}", flush=True)
    if ckpt.latest_step() != total:  # in-loop save may already cover `total`
        ckpt.save(total, state, force=True)
    ckpt.wait()
    logger.close()
    return state
