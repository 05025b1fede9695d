"""HEAR model module: WavJEPA-Nat (binaural, per-channel conv frontend,
channel-averaged timestamp embeddings).

Counterpart of /root/reference/hear_api/runtime_natjepa.py:38-165 wired as a
hear_configs-style module: 2-channel input, conv-per-channel extractor,
output steps divided by channel count and embeddings averaged over channels
(api/runtime.py handles the channel folding).
"""

from wavjepa_tpu.api.runtime import (  # noqa: F401
    get_scene_embeddings,
    get_timestamp_embeddings,
)
from wavjepa_tpu.api import runtime as _runtime


def load_model(model_file_path: str = "", in_channels: int = 2, **kwargs):
    # pos_embed: sidecar/ckpt-detected when None (runtime.load_model) —
    # configs/nat_binaural.yaml trains with "binaural", the reference's
    # published nat weights use "time"; both resolve correctly without it.
    # process_seconds stays None: sidecar-trained window wins, else 2.01 s.
    return _runtime.load_model(
        model_file_path,
        in_channels=in_channels,
        model_size=kwargs.get("model_size", "base"),
        channel_wise=True,
        pos_embed=kwargs.get("pos_embed"),
    )
