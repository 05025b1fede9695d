"""HEAR model module: WavJEPA base (6-layer conv frontend, 2.01-s windows).

Counterpart of /root/reference/hear_configs/WavJEPA.py:11-43. Import this
module name into the embeddings runner:

    python -m wavjepa_tpu.eval embeddings wavjepa_tpu.api.hear_wavjepa --model CKPT
"""

from wavjepa_tpu.api.runtime import (  # noqa: F401
    get_scene_embeddings,
    get_timestamp_embeddings,
)
from wavjepa_tpu.api import runtime as _runtime


def load_model(model_file_path: str = "", **kwargs):
    # process_seconds stays None: a model_config.json sidecar (trained
    # window) wins; the no-sidecar fallback is the HEAR-standard 2.01 s.
    return _runtime.load_model(
        model_file_path,
        in_channels=1,
        model_size=kwargs.get("model_size", "base"),
    )
