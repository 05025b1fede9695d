#!/bin/bash
# Denoise distillation launcher (counterpart of /root/reference/denoise.sh).
set -e
python denoise.py \
    teacher_ckpt="${TEACHER_CKPT:?set TEACHER_CKPT}" \
    data.data_dirs="${DATA_DIRS:?set DATA_DIRS}" \
    data.rir_dir="${RIR_DIRS:-}" \
    data.noise_dir="${NOISE_DIRS:-}" \
    trainer.steps="${STEPS:-100000}" \
    "$@"
