#!/bin/bash
# X-ARES evaluation via the HF-parity inference API (counterpart of
# /root/reference/run_xares.sh). Requires the external xares package; this
# framework supplies the model side (wavjepa_tpu.api.hf).
set -e
python - <<'PY'
from wavjepa_tpu.api.hf import WavJEPAForAudioEmbeddings, WavJEPAFeatureExtractor
import os
model = WavJEPAForAudioEmbeddings.from_pretrained(os.environ.get("CKPT", ""))
print("HF-parity model ready:", model.config.encoder_dim, "dims;"
      " wire into xares task runners via model(input_values) -> (emb, ts)")
PY
