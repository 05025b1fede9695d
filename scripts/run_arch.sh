#!/bin/bash
# ARCH evaluation (counterpart of /root/reference/run_arch.sh: SLURM array
# over 12 datasets).
set -e
python -m wavjepa_tpu.eval.arch \
    --ckpt "${CKPT:-}" \
    --data-dir "${ARCH_DATA:?set ARCH_DATA}" \
    "$@"
