#!/usr/bin/env python
"""End-to-end FED training throughput (VERDICT r2 #3): tar shards → worker
processes (decode→resample→normalize) → shuffle → host→device prefetch →
the REAL fused SSL train step, sustained for ≥2 minutes, ONE JSON line.

The question this answers (the synthetic-fed bench.py cannot): does the
shards→prefetch_to_device→step chain keep the chip fed at the rate the chip
can consume (41.15 clips/s/chip, BENCH_r02.json)?

Two ingest configs, because they bound the answer from both sides:
  * SRC=16k (default): shards store 16 kHz wavs — decode+RMS-normalize only,
    the cheapest real ingest. This measures the PIPELINE's overhead
    (queues, shuffle buffer, prefetch, host→device copies).
  * SRC=44k: shards store 44.1 kHz wavs — adds the native polyphase
    resample (~21-41 clips/s/core, bench_data.py). On this 1-core dev VM
    that is host-bound by construction; the JSON reports the measured
    per-core ingest rate and the cores/chip needed to saturate
    (reference analog: 16 DataLoader workers/GPU,
    /root/reference/data_modules/WebAudioDataModule.py:133-142).

MODE=denoise|nat (VERDICT r4 #1) runs the same protocol over the REAL
denoise/Nat ingest: 32 kHz wav shards + RIR/noise npy side-channel shards →
DenoiseSampleSource (worker processes) → int16 wire + device-resident
RIR/noise banks with per-batch ring refresh → prefetch → the real fused
denoise / Nat train step. WIRE=f32 with BANKS=0 reproduces the reference's
ship-raw-tuples wire (WebAudioDataModuleDenoiser.py:13-152) whose f32
payload is ~4-5.6 MB/clip — seconds of transfer per batch on this link.

Env knobs: MODE=ssl|denoise|nat, SRC=16k|44k (ssl), WORKERS=N (default 2),
SECONDS=120, BENCH_CLIPS=32, WIRE=int16|f32 (default int16 — the shipped
config; f32 reproduces the round-4 transfer-bound measurement: the axon
host→device link sustains ~40 MB/s, so a 32-clip f32 batch costs ~490 ms ≈
one whole SSL train step), BANKS=1|0 (denoise/nat: device scene banks on/off),
RIR_BANK/NOISE_BANK (bank sizes, default 64), PREFETCH=N (device prefetch
queue depth, default 2), STEP_LOG=path (write per-step wall-clock
timestamps as jsonl — separates steady-state rate from the buffer-drain
transient that flatters short runs).
"""

import math
import os
import tempfile
import time
from pathlib import Path

from bench_common import emit_record

SYNTH_FED_RATE = 64.01  # BENCH r3 (PERF.md) — same step, on-device synthetic batch
SYNTH_DENOISE_RATE = 49.49  # PERF.md r4 (bench_denoise.py defaults)
SYNTH_NAT_RATE = 25.76  # PERF.md r4 (bench_nat.py defaults, 4096-granule FFT)


def main():
    mode = os.environ.get("MODE", "ssl")
    if mode in ("denoise", "nat"):
        return main_scenes(mode)
    return main_ssl()


def main_scenes(mode: str):
    """Fed throughput for the denoise/Nat ingest (VERDICT r4 #1): real
    side-channel pipeline → wire → on-device scene synthesis → the real
    fused step, sustained."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench_data import build_scene_shards
    from wavjepa_tpu.data.denoise_pipeline import (
        DenoiseSampleSource,
        denoise_batches,
    )
    from wavjepa_tpu.ops.scenes import update_rir_bank
    from wavjepa_tpu.parallel.mesh import make_mesh, replicated
    from wavjepa_tpu.train.config import Config, load_config
    from wavjepa_tpu.train.loop import prefetch_to_device

    n_workers = int(os.environ.get("WORKERS", "2"))
    run_seconds = float(os.environ.get("SECONDS", "120"))
    wire = os.environ.get("WIRE", "int16")
    banks = os.environ.get("BANKS", "1") != "0"
    rir_bank_n = int(os.environ.get("RIR_BANK", "64"))
    noise_bank_n = int(os.environ.get("NOISE_BANK", "64"))
    prefetch_n = int(os.environ.get("PREFETCH", "2"))
    step_log = os.environ.get("STEP_LOG")

    n_chips = len(jax.devices())
    mesh = make_mesh(n_chips)
    batch_clips = int(os.environ.get("BENCH_CLIPS", "32")) * n_chips
    n_channels = 2 if mode == "nat" else 1

    # the step: EXACTLY the one the synthetic benches time
    if mode == "nat":
        synth_rate = SYNTH_NAT_RATE
        cfg = load_config("configs/nat_binaural.yaml")
        cfg.trainer.batch_size = batch_clips // n_chips
        from wavjepa_tpu.models.jepa import JEPA
        from wavjepa_tpu.train.state import TrainState
        from wavjepa_tpu.train.step import (
            NatSceneConfig,
            make_jepa_train_step,
            make_optimizer,
        )

        model_cfg = cfg.build_model_config()
        model = JEPA(model_cfg)
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, n_channels, model_cfg.target_length)),
        )["params"]
        tx, sched = make_optimizer(cfg.optimizer)
        state = TrainState.create(params, tx)
        masker_fn, masker_cfg = cfg.masker.build()
        step_raw = make_jepa_train_step(
            model, tx, sched,
            nr_samples_per_audio=cfg.data.samples_per_audio,
            masker=masker_fn, masker_cfg=masker_cfg, ema_cfg=cfg.ema,
            scene_cfg=NatSceneConfig(
                with_rir=True, with_noise=True, n_channels=n_channels
            ),
            accum_steps=cfg.resolved_accum_steps(),
        )

        def step(state, batch, key, bank):
            return step_raw(state, batch, key, bank)

    else:
        synth_rate = SYNTH_DENOISE_RATE
        from wavjepa_tpu.models.denoiser import (
            DenoiserConfig,
            DenoiserStudent,
            student_params_from_jepa,
        )
        from wavjepa_tpu.models.jepa import JEPA
        from wavjepa_tpu.train.denoise_step import (
            DenoiseOptimizerConfig,
            DenoiseTrainState,
            make_denoise_optimizer,
            make_denoise_train_step,
        )

        train_cfg = Config()
        train_cfg.trainer.batch_size = batch_clips // n_chips
        train_cfg.data.samples_per_audio = 8
        jcfg = train_cfg.build_denoise_model_config()
        dcfg = DenoiserConfig(jepa=jcfg, alpha=0.0, nr_samples_per_audio=8)
        teacher, student = JEPA(jcfg), DenoiserStudent(jcfg)
        teacher_params = teacher.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 1, jcfg.target_length))
        )["params"]
        tx, sched = make_denoise_optimizer(DenoiseOptimizerConfig())
        state = DenoiseTrainState.create(
            student_params_from_jepa(teacher_params), tx
        )
        step_raw = make_denoise_train_step(
            student, teacher, dcfg, tx, sched, with_rir=True, with_noise=True,
            accum_steps=train_cfg.resolved_denoise_accum_steps(),
        )
        teacher_params = jax.device_put(teacher_params, replicated(mesh))

        def step(state, batch, key, bank):
            return step_raw(state, teacher_params, batch, key, bank)

    with tempfile.TemporaryDirectory() as td:
        audio_pat, rir_pat, noise_pat = build_scene_shards(
            Path(td), sr=32000, n_channels=n_channels
        )
        source = DenoiseSampleSource(
            audio_pat,
            rir_pattern=rir_pat,
            noise_pattern=noise_pat,
            sr=32000,
            num_workers=n_workers,
            seed=0,
            transfer_dtype=wire if wire == "int16" else "float32",
            rir_bank_size=rir_bank_n if banks else 0,
            noise_bank_size=noise_bank_n if banks else 0,
        )
        try:
            it = iter(source)
            for _ in range(8):  # warm the decode/side-channel path
                next(it)
            t0 = time.perf_counter()
            probe_n = 32
            for _ in range(probe_n):
                next(it)
            host_rate = probe_n / (time.perf_counter() - t0)

            bank_host = source.scene_bank() if banks else None
            bank = (
                jax.device_put(bank_host, replicated(mesh))
                if bank_host is not None
                else None
            )
            batches = denoise_batches(
                source, batch_clips, refresh_rirs_per_batch=1 if banks else 0
            )
            device_iter = prefetch_to_device(batches, mesh, size=prefetch_n)
            key = jax.random.PRNGKey(1)

            def one_step(state, bank):
                batch = next(device_iter)
                refresh = batch.pop("rir_bank_refresh", None)
                if refresh is not None:
                    bank = update_rir_bank(bank, refresh["slots"], refresh["rows"])
                state, metrics = step(state, batch, key, bank)
                return state, bank, metrics

            # compile + warmup, closed by host fetches
            for _ in range(2):
                state, bank, metrics = one_step(state, bank)
                float(metrics["loss"])

            iters = 0
            marks = []  # (iters, wall_s) at each fetch-closed point
            t0 = time.perf_counter()
            while True:
                state, bank, metrics = one_step(state, bank)
                iters += 1
                if iters % 5 == 0:
                    float(metrics["loss"])
                    marks.append((iters, time.perf_counter() - t0))
                    if marks[-1][1] >= run_seconds:
                        break
            loss = float(metrics["loss"])
            dt = time.perf_counter() - t0
            if step_log:
                import json as _json

                with open(step_log, "w") as f:
                    for it, ts in marks:
                        f.write(_json.dumps({"step": it, "t": round(ts, 3)}) + "\n")
        finally:
            source.stop()

    assert math.isfinite(loss), f"non-finite loss {loss}"
    value = batch_clips * iters / dt / n_chips
    emit_record(
        f"e2e_fed_{mode}_clips_per_sec_per_chip",
        value,
        baseline=37.04 if mode == "denoise" else 50.5,
        fed_fraction_of_synthetic=round(value / synth_rate, 3),
        host_ingest_clips_per_sec=round(host_rate, 1),
        wire=wire,
        banks=banks,
        workers=n_workers,
        run_seconds=round(dt, 1),
        steps=iters,
    )


def main_ssl():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench_data import build_shards
    from wavjepa_tpu.data.pipeline import ShardAudioSource, shuffled_batches
    from wavjepa_tpu.models.jepa import JEPA
    from wavjepa_tpu.parallel.mesh import make_mesh
    from wavjepa_tpu.train.config import Config
    from wavjepa_tpu.train.loop import prefetch_to_device
    from wavjepa_tpu.train.state import TrainState
    from wavjepa_tpu.train.step import (
        OptimizerConfig,
        make_jepa_train_step,
        make_optimizer,
    )

    src = os.environ.get("SRC", "16k")
    sr = 44100 if src == "44k" else 16000
    n_workers = int(os.environ.get("WORKERS", "2"))
    run_seconds = float(os.environ.get("SECONDS", "120"))
    wire = os.environ.get("WIRE", "int16")
    transfer_dtype = "int16" if wire == "int16" else "float32"

    n_chips = len(jax.devices())
    mesh = make_mesh(n_chips)
    batch_clips = int(os.environ.get("BENCH_CLIPS", "32")) * n_chips
    n_crops = 8

    train_cfg = Config()
    # keep the auto accum/remat resolution aligned with the fed batch so the
    # step here is EXACTLY the one bench.py times (accum-16 at 256 crops)
    train_cfg.trainer.batch_size = batch_clips // n_chips
    cfg = train_cfg.build_model_config()
    model = JEPA(cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 1, cfg.target_length))
    )["params"]
    tx, sched = make_optimizer(OptimizerConfig())
    state = TrainState.create(params, tx)
    step = make_jepa_train_step(
        model, tx, sched, nr_samples_per_audio=n_crops,
        accum_steps=train_cfg.resolved_accum_steps(),
    )

    with tempfile.TemporaryDirectory() as td:
        # enough unique clips that the stream never rewinds mid-window;
        # workers repeat shards forever anyway (iter_shard_samples repeat)
        pattern = build_shards(Path(td), n_shards=8, clips_per_shard=32, sr=sr)
        source = ShardAudioSource(
            pattern,
            target_sr=16000,
            num_workers=n_workers,
            queue_size=256,
            seed=0,
            transfer_dtype=transfer_dtype,
        ).start()
        try:
            # host-only ingest probe first (clips/s at this worker count,
            # measured cold — informs the cores-needed arithmetic)
            it = iter(source)
            for _ in range(8):  # warm the decode path
                next(it)
            t0 = time.perf_counter()
            probe_n = 48
            for _ in range(probe_n):
                next(it)
            host_rate = probe_n / (time.perf_counter() - t0)

            batches = shuffled_batches(it, batch_clips, shuffle_buffer=128)
            device_iter = prefetch_to_device(batches, mesh)
            key = jax.random.PRNGKey(1)

            # compile + warmup (closed by host fetch; see bench_common.time_steps)
            state, metrics = step(state, next(device_iter), key)
            float(metrics["loss"])
            state, metrics = step(state, next(device_iter), key)
            float(metrics["loss"])

            # sustained fed run: iterate for >= run_seconds wall-clock,
            # closing the chain with a host fetch every ~10 steps so the
            # measurement can't run ahead of the device
            iters = 0
            t0 = time.perf_counter()
            while True:
                state, metrics = step(state, next(device_iter), key)
                iters += 1
                if iters % 10 == 0:
                    float(metrics["loss"])
                    if time.perf_counter() - t0 >= run_seconds:
                        break
            loss = float(metrics["loss"])
            dt = time.perf_counter() - t0
        finally:
            source.stop()

    assert math.isfinite(loss), f"non-finite loss {loss}"
    clips_per_sec = batch_clips * iters / dt
    value = clips_per_sec / n_chips
    emit_record(
        f"e2e_fed_clips_per_sec_per_chip_{src}",
        value,
        fed_fraction_of_synthetic=round(value / SYNTH_FED_RATE, 3),
        host_ingest_clips_per_sec=round(host_rate, 1),
        wire=wire,
        workers=n_workers,
        run_seconds=round(dt, 1),
        steps=iters,
        cores_per_chip_to_saturate=round(
            SYNTH_FED_RATE / max(host_rate / _cores_used(n_workers), 1e-9), 2
        ) if src == "44k" else 1,
    )


def _cores_used(n_workers: int) -> int:
    """Workers time-share the host: the probe's host_rate is delivered by
    min(n_workers, available cores) cores, so per-core ingest is
    host_rate / cores_used (NOT / n_workers — on a 1-core VM two workers
    still only consume one core's worth of CPU). "Available" respects the
    scheduler affinity mask (cgroup/container limits), not the machine's
    logical CPU count (ADVICE r3)."""
    try:
        n_cores = len(os.sched_getaffinity(0))
    except (AttributeError, OSError):
        n_cores = os.cpu_count() or 1
    return max(1, min(n_workers, n_cores))


if __name__ == "__main__":
    main()
