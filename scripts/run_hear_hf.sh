#!/bin/bash
# HEAR evaluation through the HF-parity surface (counterpart of
# /root/reference/run_hear_hf.sh).
set -euo pipefail
MODULE="wavjepa_tpu.api.hear_wavjepa_hf"
CKPT="${CKPT:-}"
TASKS_DIR="${TASKS_DIR:-tasks}"
EMB_DIR="${EMB_DIR:-embeddings}"
python -m wavjepa_tpu.eval embeddings "$MODULE" --model "$CKPT" \
    --tasks-dir "$TASKS_DIR" --embeddings-dir "$EMB_DIR"
ls -d "$EMB_DIR"/"$MODULE"/*/ | sed 's|^|python -m wavjepa_tpu.eval predictions |' \
    | python -m wavjepa_tpu.eval.multidevice
