from wavjepa_tpu.utils.metrics import MetricLogger, Throughput  # noqa: F401
from wavjepa_tpu.utils.profiling import (  # noqa: F401
    device_memory_stats,
    timed,
    trace,
)
