#!/usr/bin/env python
"""Denoiser distillation CLI (WavJEPA → robust student).

Usage:
    python denoise.py [config.yaml] [key=value ...]

Examples (mirroring the reference denoise CLI, /root/reference/denoise.sh):
    python denoise.py teacher_ckpt=runs/.../ckpt data.data_dirs='audioset-{000..869}.tar' \\
        data.rir_dir='rirs-{000..009}.tar' data.noise_dir='wham-{000..019}.tar' \\
        trainer.steps=100000 optimizer.lr=1e-4 alpha=0.0
    python denoise.py data.synthetic=true trainer.steps=50     # smoke run
"""

import sys


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    from wavjepa_tpu.train.config import apply_overrides, load_config

    cfg_path = None
    if argv and argv[0].endswith((".yaml", ".yml")):
        cfg_path = argv.pop(0)
    cfg = apply_overrides(load_config(cfg_path), argv)
    cfg.model = "Denoiser"
    # denoise defaults differ from SSL pretraining (reference
    # configs/optimizer adamW denoise: lr 1e-4 wd 0, grad clip 1.0,
    # 16 crops/clip, 100 k steps)
    if not any(o.startswith("optimizer.lr") for o in argv):
        cfg = apply_overrides(cfg, ["optimizer.lr=1e-4"])
    if not any(o.startswith("optimizer.weight_decay") for o in argv):
        cfg = apply_overrides(cfg, ["optimizer.weight_decay=0.0"])
    if not any(o.startswith("optimizer.grad_clip") for o in argv):
        cfg = apply_overrides(cfg, ["optimizer.grad_clip=1.0"])
    if not any(o.startswith("data.samples_per_audio") for o in argv):
        cfg.data.samples_per_audio = 16
    if not any(o.startswith("trainer.steps") for o in argv):
        cfg.trainer.steps = 100_000
    if not any(o.startswith("trainer.batch_size") for o in argv):
        # 8 clips × 16 crops fits a 16 GB v5e chip (the reference's 32×16
        # assumes 80 GB GPUs); effective batch scales with data parallelism
        cfg.trainer.batch_size = 8

    print(f"run: Denoise-{cfg.run_identity()}", flush=True)
    from wavjepa_tpu.train.denoise_loop import train_denoiser

    train_denoiser(cfg)


if __name__ == "__main__":
    main()
