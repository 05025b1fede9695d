from wavjepa_tpu.eval.score import available_scores  # noqa: F401
