"""HEAR model module: WavJEPA with the wav2vec2 frontend (7 conv layers,
stride 320 → 20 ms frames, 4.02-s windows → 200 patches).

Counterpart of /root/reference/hear_configs/WavJEPA_w2v2.py:11-43.
"""

import jax.numpy as jnp

from wavjepa_tpu.api.runtime import (  # noqa: F401
    RuntimeJEPA,
    get_scene_embeddings,
    get_timestamp_embeddings,
)
from wavjepa_tpu.api import runtime as _runtime
from wavjepa_tpu.models.jepa import JEPAConfig
from wavjepa_tpu.ops.conv_frontend import WAV2VEC2_CONV_SPEC


def load_model(model_file_path: str = "", **kwargs):
    config = JEPAConfig(
        conv_spec=WAV2VEC2_CONV_SPEC,
        in_channels=1,
        process_seconds=4.02,
        size=kwargs.get("model_size", "base"),
        dtype=jnp.bfloat16,
    )
    return _runtime.load_model(model_file_path, config=config)
