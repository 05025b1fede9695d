from wavjepa_tpu.train.config import Config, apply_overrides, load_config  # noqa: F401
from wavjepa_tpu.train.state import TrainState, ema_update  # noqa: F401
