#!/bin/bash
# HEAR evaluation over all tasks (counterpart of /root/reference/run_hear.sh,
# which SLURM-arrays over 11 tasks; here tasks shard over local chips).
set -euo pipefail
MODULE="${MODULE:-wavjepa_tpu.api.hear_wavjepa}"
CKPT="${CKPT:-}"
TASKS_DIR="${TASKS_DIR:-tasks}"
EMB_DIR="${EMB_DIR:-embeddings}"
python -m wavjepa_tpu.eval embeddings "$MODULE" --model "$CKPT" \
    --tasks-dir "$TASKS_DIR" --embeddings-dir "$EMB_DIR"
ls -d "$EMB_DIR"/"$MODULE"/*/ | sed 's|^|python -m wavjepa_tpu.eval predictions |' \
    | python -m wavjepa_tpu.eval.multidevice
