"""Validate the accum auto-heuristics off the measured point (VERDICT r3 #9).

resolved_accum_steps() was tuned at one point (base model, 256 crops:
accum 16). This sweeps the SSL step at 64- and 128-crop batches and on the
large variant, through the SHIPPED config-resolution path (trainer.accum_steps
override + auto remat/packing), so the rows validate what train.py actually
does. OOM cells are reported, not fatal.

GRID env var selects cells: comma-separated `size:batch:accum[:rematdec]`
(accum 0 = auto; rematdec `on`/`off` forces trainer.remat_decoder, absent =
config default — auto keeps decoder remat ON at accum=1, so the 4th field
separates scan overhead from the remat replay at small batches). Default
covers base@8/16 and large@8/32.
"""
import gc
import os
import sys

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from wavjepa_tpu.models.jepa import JEPA
from wavjepa_tpu.train.config import Config
from wavjepa_tpu.train.state import TrainState
from wavjepa_tpu.train.step import make_jepa_train_step, make_optimizer
from wavjepa_tpu.masking import TimeInverseMaskConfig
from scripts._timing import time_steps

DEFAULT_GRID = (
    "base:8:1,base:8:1:off,base:8:2,base:8:4,"
    "base:16:1,base:16:1:off,base:16:2,base:16:4,base:16:8,"
    "large:8:1,large:8:1:off,large:8:2,large:8:4,"
    "large:32:4,large:32:8,large:32:16,large:32:32"
)
cells = [c.split(":") for c in os.environ.get("GRID", DEFAULT_GRID).split(",")]

S = 8
_params_cache = {}
for cell in cells:
    size, b, a = cell[:3]
    remat_dec = cell[3] if len(cell) > 3 else None
    B, accum_req = int(b), int(a)
    cfg = Config()
    cfg.trainer.size = size
    cfg.trainer.batch_size = B
    cfg.trainer.accum_steps = accum_req
    if remat_dec is not None:
        cfg.trainer.remat_decoder = remat_dec == "on"
    accum = cfg.resolved_accum_steps()
    auto = Config()
    auto.trainer.size = size
    auto.trainer.batch_size = B
    auto_pick = auto.resolved_accum_steps()
    model_cfg = cfg.build_model_config()
    model = JEPA(model_cfg)
    tag = f"{size}:{model_cfg.remat_conv}:{model_cfg.remat_encoder}:{model_cfg.remat_decoder}"
    if size not in _params_cache:
        _params_cache[size] = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 1, model_cfg.target_length))
        )["params"]
    crops = B * S
    label = f"{size} B={B} crops={crops} accum={accum}" + (
        " (AUTO)" if accum == auto_pick and remat_dec is None else ""
    ) + (f" rematdec={remat_dec}" if remat_dec is not None else "")
    try:
        # Fresh copies per cell: the step donates its state (the shipped
        # train path does — r4 reprofile showed donation moves near-cliff
        # cells by >270 ms), and donation invalidates the cached buffers.
        # Inside the try: the copy itself can RESOURCE_EXHAUST if a
        # previous OOM'd cell left HBM fragmented.
        params = jax.tree.map(jnp.copy, _params_cache[size])
        tx, sched = make_optimizer(cfg.optimizer)
        state = TrainState.create(params, tx)
        audio = jnp.asarray(
            np.random.default_rng(0).standard_normal((B, 1, 160000)),
            jnp.float32,
        )
        step = make_jepa_train_step(
            model, tx, sched, nr_samples_per_audio=S,
            masker_cfg=TimeInverseMaskConfig(), ema_cfg=cfg.ema,
            accum_steps=accum, donate=True,
        )
        dt, out = time_steps(step, state, audio, jax.random.PRNGKey(1), n=4)
        print(
            f"{label:44s} {dt*1e3:8.1f} ms  {B/dt:7.2f} clips/s  [{tag}]",
            flush=True,
        )
    except Exception as e:  # OOM or compile failure is a data point
        print(f"{label:44s} FAILED: {type(e).__name__}: {str(e)[:140]}", flush=True)
    finally:
        # Drop this cell's device buffers before the next cell compiles —
        # a full train state left live across cells OOMs later cells.
        params = state = audio = step = out = None
        gc.collect()
