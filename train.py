#!/usr/bin/env python
"""WavJEPA SSL pretraining CLI.

Usage:
    python train.py [config.yaml] [key=value ...]

Examples (mirroring the reference Hydra CLI, /root/reference/train.sh):
    python train.py data.name=AudioSet data.data_dirs='shards/unbal-{000..869}.tar'
    python train.py masker.name=speech-masker extractor.name=wav2vec2 \\
        trainer.batch_size=64 data.process_seconds=4.02
    python train.py data.synthetic=true trainer.steps=100   # smoke run
"""

import sys


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    from wavjepa_tpu.train.config import apply_overrides, load_config

    cfg_path = None
    if argv and argv[0].endswith((".yaml", ".yml")) and "=" not in argv[0]:
        cfg_path = argv.pop(0)
    cfg = apply_overrides(load_config(cfg_path), argv)

    print(f"run: {cfg.run_identity()}", flush=True)
    from wavjepa_tpu.train.loop import train_jepa

    train_jepa(cfg)


if __name__ == "__main__":
    main()
