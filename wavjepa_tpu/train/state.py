"""Train state: one pytree holding student params, EMA-teacher encoder
params, optimizer state, and the step counter.

The reference keeps the teacher as a deep-copied frozen nn.Module
(/root/reference/wavjepa/jepa.py:182-184); here it is just a second
parameter tree for the same encoder definition — the EMA update is a pure
`tree_map` (always f32, like the reference's autocast-disabled update,
jepa.py:330-332) executed inside the jitted train step.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    params: Any
    teacher_encoder: Any  # EMA copy of params["encoder"]
    opt_state: optax.OptState
    step: jax.Array  # scalar int32

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation) -> "TrainState":
        return cls(
            params=params,
            teacher_encoder=jax.tree.map(jnp.copy, params["encoder"]),
            opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
        )


def ema_update(teacher, student, decay):
    """teacher ← decay·teacher + (1-decay)·student, computed in f32."""
    return jax.tree.map(
        lambda t, s: (
            decay * t.astype(jnp.float32) + (1.0 - decay) * s.astype(jnp.float32)
        ).astype(t.dtype),
        teacher,
        student,
    )
