"""Validate the accum auto-heuristics off the measured point (VERDICT r3 #9).

resolved_accum_steps() was tuned at one point (base model, 256 crops:
accum 16). This sweeps the SSL step at 64- and 128-crop batches and on the
large variant, through the SHIPPED config-resolution path (trainer.accum_steps
override + auto remat/packing), so the rows validate what train.py actually
does. OOM cells are reported, not fatal.

GRID env var selects cells: comma-separated `size:batch:accum` (accum 0 =
auto). Default covers base@8/16 and large@32.
"""
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
    "base:8:1,base:8:2,base:8:4,"
    "base:16:1,base:16:2,base:16:4,base:16:8,"
    "large:32:4,large:32:8,large:32:16,large:32:32"
)
cells = [c.split(":") for c in os.environ.get("GRID", DEFAULT_GRID).split(",")]

S = 8
_params_cache = {}
for size, b, a in cells:
    B, accum_req = int(b), int(a)
    cfg = Config()
    cfg.trainer.size = size
    cfg.trainer.batch_size = B
    cfg.trainer.accum_steps = accum_req
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
    params = _params_cache[size]
    tx, sched = make_optimizer(cfg.optimizer)
    state = TrainState.create(params, tx)
    audio = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, 1, 160000)), jnp.float32
    )
    step = make_jepa_train_step(
        model, tx, sched, nr_samples_per_audio=S,
        masker_cfg=TimeInverseMaskConfig(), ema_cfg=cfg.ema,
        accum_steps=accum, donate=False,
    )
    crops = B * S
    label = f"{size} B={B} crops={crops} accum={accum}" + (
        " (AUTO)" if accum == auto_pick else ""
    )
    try:
        dt, _ = time_steps(step, state, audio, jax.random.PRNGKey(1), n=4)
        print(
            f"{label:44s} {dt*1e3:8.1f} ms  {B/dt:7.2f} clips/s  [{tag}]",
            flush=True,
        )
    except Exception as e:  # OOM or compile failure is a data point
        print(f"{label:44s} FAILED: {type(e).__name__}: {str(e)[:140]}", flush=True)
