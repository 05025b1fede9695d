from wavjepa_tpu.ops.pos_embed import (  # noqa: F401
    get_1d_sincos_pos_embed,
    get_1d_sincos_pos_embed_from_grid,
    get_2d_sincos_pos_embed,
    get_binaural_pos_embed,
)
from wavjepa_tpu.ops.audio import (  # noqa: F401
    instance_normalize,
    normalize_audio_dbfs,
    pad_or_truncate,
)
