from wavjepa_tpu.models.jepa import JEPA, JEPAConfig  # noqa: F401
from wavjepa_tpu.models.denoiser import (  # noqa: F401
    DenoiserConfig,
    DenoiserStudent,
    denoiser_distillation_loss,
    student_params_from_jepa,
)
