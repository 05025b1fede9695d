"""JEPA pretraining driver: mesh setup, state init/resume, step loop,
checkpointing, metrics.

The TPU-native counterpart of the reference's Lightning Trainer usage
(/root/reference/train.py:160-180,225-250): one SPMD program over a device
mesh instead of DDP process spawning; orbax instead of ModelCheckpoint;
clips/sec/chip counters instead of Lightning progress bars. Resume is
first-class (the reference SSL path cannot resume — SURVEY.md §5).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from wavjepa_tpu.models.jepa import JEPA
from wavjepa_tpu.parallel.mesh import make_mesh, shard_batch
from wavjepa_tpu.train.checkpoint import CheckpointManager, write_model_config
from wavjepa_tpu.train.config import Config
from wavjepa_tpu.train.state import TrainState
from wavjepa_tpu.train.step import (
    NatSceneConfig,
    make_jepa_train_step,
    make_optimizer,
)
from wavjepa_tpu.utils.metrics import MetricLogger, Throughput


def build_data_iterator(
    cfg: Config, start_step: int = 0
) -> tuple[Iterator[np.ndarray], Optional[dict]]:
    """Returns (batch iterator, host RIR bank or None — Nat real-data runs
    only, see denoise_loop.build_denoise_data_iterator).

    ``start_step`` positions a resumable stream at the batch a resumed
    run will consume next. The synthetic source rebuilds its exact position
    in O(1) (per-index keying); the shard pipeline intentionally does NOT
    fast-forward — it is a stochastic infinite stream with no meaningful
    position (the reference's wds .repeat()+shuffle semantics), and skipping
    N·batch real decodes would stall a deep resume for hours."""
    if cfg.data.nat_scenes:
        # Nat: raw (audio, RIRs, noise, SNR) batches; scenes synthesize on
        # device inside the step (train/step.py NatSceneConfig)
        from wavjepa_tpu.train.denoise_loop import (
            build_denoise_data_iterator,
            effective_scene_flags,
        )

        return build_denoise_data_iterator(cfg)
    if cfg.data.synthetic or not cfg.data.data_dirs:
        from wavjepa_tpu.data.synthetic import synthetic_audio_batches

        return synthetic_audio_batches(
            cfg.trainer.batch_size,
            in_channels=cfg.data.in_channels,
            seconds=cfg.data.target_seconds,
            sr=cfg.data.sr,
            seed=cfg.trainer.seed,
            start_batch=start_step,
        ), None
    from wavjepa_tpu.data.pipeline import audio_shard_batches

    return audio_shard_batches(cfg), None


def prefetch_to_device(iterator, mesh, size: int = 2):
    """Threaded host→device prefetch: a background thread pulls host batches
    and issues `device_put`s into a bounded buffer while the current step
    runs (the JAX analog of the reference DataLoader's pin_memory+
    prefetch_factor, WebAudioDataModule.py:133-142).

    A THREAD, not just a deque: device_put's issue-side cost (host staging
    copy + transfer setup — ~17 ms per int16 batch, more on the tunneled
    axon link) plus the iterator's own batch assembly (np.stack, shuffle
    evictions) would otherwise run serialized between steps on the training
    thread — measured 45 ms/step of the round-4 e2e gap."""
    import queue as _queue
    import threading

    def put(batch):
        if isinstance(batch, dict):
            out = {}
            for k, v in batch.items():
                if k == "rir_bank_refresh":
                    # bank-refresh payload updates the REPLICATED device
                    # bank (ops/scenes.update_rir_bank) — replicate it, the
                    # batch sharding over the data axis does not apply
                    from wavjepa_tpu.parallel.mesh import replicated

                    out[k] = jax.tree.map(
                        lambda x: jax.device_put(
                            jnp.asarray(x), replicated(mesh)
                        ),
                        v,
                    )
                else:
                    out[k] = shard_batch(mesh, jnp.asarray(v))
            return out
        return shard_batch(mesh, jnp.asarray(batch))

    buf: _queue.Queue = _queue.Queue(maxsize=max(1, size))
    _SENTINEL = object()
    error: list = []
    stop = threading.Event()

    def _put(item) -> bool:
        """Blocking put that aborts when the consumer is gone (a finished
        train loop closes this generator mid-stream; without the stop check
        the producer would block on the full queue forever, leaking a thread
        and the device buffers parked in it)."""
        while not stop.is_set():
            try:
                buf.put(item, timeout=0.2)
                return True
            except _queue.Full:
                continue
        return False

    def producer():
        try:
            for batch in iterator:
                if not _put(put(batch)):
                    return
        except BaseException as exc:  # re-raised on the consumer side
            error.append(exc)
        finally:
            _put(_SENTINEL)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    try:
        while True:
            item = buf.get()
            if item is _SENTINEL:
                if error:
                    raise error[0]
                return
            yield item
    finally:
        stop.set()
        while not buf.empty():  # unblock a producer mid-put
            try:
                buf.get_nowait()
            except _queue.Empty:
                break
        thread.join(timeout=1.0)  # may still be inside iterator.next();
        # daemon thread, the owning source's stop() handles that side


def train_jepa(
    cfg: Config,
    data_iter: Optional[Iterator[np.ndarray]] = None,
    max_steps: Optional[int] = None,
) -> TrainState:
    """Run (or resume) JEPA pretraining. Returns the final TrainState."""
    mesh = make_mesh(
        cfg.trainer.num_devices or None, model_parallel=cfg.trainer.model_parallel
    )
    n_chips = int(np.prod(mesh.devices.shape))

    model_cfg = cfg.build_model_config()
    model = JEPA(model_cfg)
    rng = jax.random.PRNGKey(cfg.trainer.seed)
    k_init, k_train = jax.random.split(rng)

    tx, lr_sched = make_optimizer(cfg.optimizer)
    masker_fn, masker_cfg = cfg.masker.build()
    scene_cfg = None
    if cfg.data.nat_scenes:
        from wavjepa_tpu.train.denoise_loop import effective_scene_flags

        with_rir, with_noise = effective_scene_flags(cfg)
        scene_cfg = NatSceneConfig(
            with_rir=with_rir,
            with_noise=with_noise,
            n_channels=cfg.data.in_channels,
        )
    step_fn = make_jepa_train_step(
        model,
        tx,
        lr_sched,
        nr_samples_per_audio=cfg.data.samples_per_audio,
        masker=masker_fn,
        masker_cfg=masker_cfg,
        ema_cfg=cfg.ema,
        scene_cfg=scene_cfg,
        accum_steps=cfg.resolved_accum_steps(),
    )

    init_audio = jnp.zeros((1, cfg.data.in_channels, model_cfg.target_length))
    params = model.init(k_init, init_audio)["params"]
    state = TrainState.create(params, tx)

    run_dir = Path(cfg.trainer.save_dir) / cfg.run_identity()
    write_model_config(run_dir, model_cfg)
    ckpt = CheckpointManager(
        run_dir / "ckpt", keep=cfg.trainer.keep_ckpts, every=cfg.trainer.ckpt_every
    )
    if ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        print(f"resumed from step {int(state.step)}", flush=True)

    logger = MetricLogger(str(run_dir / "tb"))
    # built AFTER restore so a resumable stream starts at the right batch
    # (resume-equivalence: train N == train k, restore, train N−k; callers
    # passing data_iter position it themselves)
    bank_host = None
    if data_iter is None:
        data_iter, bank_host = build_data_iterator(cfg, start_step=int(state.step))
    total = max_steps if max_steps is not None else cfg.trainer.steps
    clips_per_step = cfg.trainer.batch_size * cfg.data.samples_per_audio
    throughput = Throughput(clips_per_step, n_chips)

    start_step = int(state.step)
    throughput.start()
    last_metrics = {}
    # `step` is tracked on HOST: the device-side counter (state.step) is
    # deterministic (+1 per call), and fetching it every iteration would force
    # a device→host transfer that stalls async dispatch (VERDICT r1 weak #5).
    # Metrics are fetched (the only sync) at log_every / checkpoint points.
    from wavjepa_tpu.ops.scenes import update_rir_bank
    from wavjepa_tpu.parallel.mesh import replicated

    rir_bank = (
        jax.device_put(bank_host, replicated(mesh)) if bank_host is not None else None
    )
    step = start_step
    device_iter = prefetch_to_device(data_iter, mesh)
    for _ in range(start_step, total):
        batch = next(device_iter)
        if isinstance(batch, dict):
            refresh = batch.pop("rir_bank_refresh", None)
            if refresh is not None:
                rir_bank = update_rir_bank(
                    rir_bank, refresh["slots"], refresh["rows"]
                )
        state, metrics = step_fn(state, batch, k_train, rir_bank)
        step += 1
        if step % cfg.trainer.log_every == 0 or step == total:
            last_metrics = {k: float(v) for k, v in metrics.items()}
            last_metrics.update(throughput.step())
            logger.log(step, last_metrics)
        else:
            throughput.step()
        saved = ckpt.save(step, state)
        if saved:
            print(f"checkpoint @ {step}", flush=True)
    if ckpt.latest_step() != total:  # in-loop save may already cover `total`
        ckpt.save(total, state, force=True)
    ckpt.wait()
    logger.close()
    return state
