from wavjepa_tpu.api.runtime import (  # noqa: F401
    RuntimeJEPA,
    get_scene_embeddings,
    get_timestamp_embeddings,
    load_model,
)
