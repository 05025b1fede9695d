#!/bin/bash
# SSL pretraining launcher (counterpart of /root/reference/train.sh).
# On a TPU pod slice, run once per host; jax.distributed.initialize picks up
# the TPU runtime topology automatically.
set -e
python train.py \
    data.data_dirs="${DATA_DIRS:-shards/audioset-unbal-{000000..000869}.tar}" \
    trainer.batch_size="${BATCH_SIZE:-32}" \
    trainer.steps="${STEPS:-375000}" \
    "$@"
