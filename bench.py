#!/usr/bin/env python
"""Pretrain-throughput benchmark: clips/sec/chip on the AudioSet SSL config.

Runs the full fused JEPA train step (WavJEPA base, 111 M params: crop gather
+ instance norm + on-device masking + conv frontend + 12L/768 encoder +
12L/384 predictor + EMA teacher + AdamW) at the reference's per-GPU batch
(32 clips × 8 crops = 256 crops/step — /root/reference/train.py:209-216) on
synthetic 10-s clips, and prints ONE JSON line.

vs_baseline derivation: the reference publishes no throughput (BASELINE.md).
Its training budget is 375 000 steps × 32 clips/step/GPU within a ≤66 h
SLURM walltime on H100s (train.sh), i.e. ≥50.5 clips/sec/GPU if the full
walltime is used — we take that as the baseline clips/sec/chip estimate.
Hardware context for reading the ratio: an H100 peaks at ~989 bf16 TFLOP/s
vs ~197 on a v5e chip (5.0×), so per-chip parity with the H100 floor
estimate corresponds to ~5× better per-FLOP efficiency. Timing here closes
with a host value fetch (the tunneled TPU backend does not block in
block_until_ready; see the project verify skill).
"""

import json
import math
import time

BASELINE_CLIPS_PER_SEC_PER_CHIP = 50.5


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from wavjepa_tpu.models.jepa import JEPA
    from wavjepa_tpu.parallel.mesh import make_mesh, shard_batch
    from wavjepa_tpu.train.state import TrainState
    from wavjepa_tpu.train.step import (
        OptimizerConfig,
        make_jepa_train_step,
        make_optimizer,
    )

    import os

    n_chips = len(jax.devices())
    mesh = make_mesh(n_chips)
    # reference per-GPU clip batch (32), scaled; BENCH_CLIPS overrides the
    # per-chip clip count for utilization experiments
    batch_clips = int(os.environ.get("BENCH_CLIPS", "32")) * n_chips
    n_crops = 8

    # the EXACT model config train.py derives (visible-token packing 88/128
    # + remat overrides at the AudioSet defaults) — built through
    # Config.build_model_config so the bench can never silently measure a
    # different config than training runs; PACK=0 disables for A/B runs
    from wavjepa_tpu.train.config import Config

    train_cfg = Config()
    # keep the auto accum/remat resolution aligned with the actual bench batch
    train_cfg.trainer.batch_size = batch_clips // n_chips
    if os.environ.get("PACK", "1") == "0":
        train_cfg.trainer.pack_tokens = "off"
    cfg = train_cfg.build_model_config()
    model = JEPA(cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 1, cfg.target_length))
    )["params"]
    tx, sched = make_optimizer(OptimizerConfig())
    state = TrainState.create(params, tx)
    # ACCUM overrides the auto-resolved microbatch count for A/B runs
    accum = int(os.environ.get("ACCUM", str(train_cfg.resolved_accum_steps())))
    step = make_jepa_train_step(
        model, tx, sched, nr_samples_per_audio=n_crops, accum_steps=accum
    )

    rng = np.random.default_rng(0)
    audio = rng.standard_normal((batch_clips, 1, 160000)).astype(np.float32)
    audio = shard_batch(mesh, jnp.asarray(audio))
    key = jax.random.PRNGKey(1)

    # compile + warmup. NOTE: timing is closed by a host value fetch of the
    # LAST step's loss — it depends on the whole donated-state chain, so it
    # forces every timed step. (block_until_ready does not reliably block on
    # tunneled/remote TPU backends — measured 100x-inflated rates with it.)
    state, metrics = step(state, audio, key)
    float(metrics["loss"])
    for _ in range(2):
        state, metrics = step(state, audio, key)
    float(metrics["loss"])

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, audio, key)
    loss = float(metrics["loss"])
    dt = time.perf_counter() - t0
    assert math.isfinite(loss), f"non-finite loss {loss}"

    clips_per_sec = batch_clips * iters / dt
    value = clips_per_sec / n_chips

    # MFU: analytic useful FLOPs (student fwd + teacher fwd + 2x student
    # bwd; remat recompute excluded by convention) / measured step time /
    # 197 bf16 TFLOP/s v5e peak — VERDICT r1 item 10, so progress is
    # measurable independently of the H100-walltime baseline estimate.
    from wavjepa_tpu.utils.flops import jepa_step_flops, mfu

    step_flops = jepa_step_flops(cfg, n_crops * batch_clips // n_chips)
    step_seconds = dt / iters
    print(
        json.dumps(
            {
                "metric": "pretrain_clips_per_sec_per_chip",
                "value": round(value, 2),
                "unit": "clips/s/chip",
                "vs_baseline": round(value / BASELINE_CLIPS_PER_SEC_PER_CHIP, 3),
                "step_time_ms": round(1000 * step_seconds, 1),
                "tflops_per_step": round(step_flops / 1e12, 2),
                "mfu": round(mfu(step_flops, step_seconds), 4),
            }
        )
    )


if __name__ == "__main__":
    main()
