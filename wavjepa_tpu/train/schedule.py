"""Learning-rate and EMA-decay schedules.

Matches the reference training recipe: HuggingFace
``get_cosine_schedule_with_warmup`` stepped per-optimizer-step
(/root/reference/wavjepa/jepa.py:224-228) and a linear EMA-decay anneal
(jepa.py:186-191).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def warmup_cosine_schedule(
    peak_lr: float, warmup_steps: int, total_steps: int
) -> optax.Schedule:
    """lr(t) = peak·t/warmup for t<warmup, then
    peak·max(0, ½(1+cos(π·progress))) — the exact HF cosine-with-warmup
    curve (single half-cosine, floor at 0)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = peak_lr * step / jnp.maximum(1.0, warmup_steps)
        progress = (step - warmup_steps) / jnp.maximum(1.0, total_steps - warmup_steps)
        cos = peak_lr * jnp.maximum(0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * progress)))
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule


def ema_decay_schedule(
    start_decay: float = 0.999,
    end_decay: float = 0.99999,
    anneal_end_step: int = 100_000,
):
    """Linear anneal start→end over ``anneal_end_step`` steps, then constant
    (reference `_get_ema_decay`)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        pct_remaining = 1.0 - step / anneal_end_step
        annealed = end_decay - (end_decay - start_decay) * pct_remaining
        return jnp.where(step >= anneal_end_step, end_decay, annealed)

    return schedule
