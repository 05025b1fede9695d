from wavjepa_tpu.models.jepa import JEPA, JEPAConfig  # noqa: F401
