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
    if argv and argv[0].endswith((".yaml", ".yml")) and "=" not in argv[0]:
        cfg_path = argv.pop(0)
    raw = None
    if cfg_path:
        import yaml

        with open(cfg_path) as f:
            raw = yaml.safe_load(f) or {}
    cfg = apply_overrides(load_config(data=raw), argv)
    cfg.model = "Denoiser"

    # denoise defaults differ from SSL pretraining (reference
    # configs/optimizer adamW denoise: lr 1e-4 wd 0, grad clip 1.0,
    # 16 crops/clip, 100 k steps). They yield to values set EITHER on the
    # CLI or in the YAML file — a config-file value must never be clobbered.
    # load_config/apply_overrides record every YAML- and CLI-set key
    explicit = set(cfg.explicit_keys)

    def unset(key):
        return key not in explicit

    if unset("optimizer.lr"):
        cfg = apply_overrides(cfg, ["optimizer.lr=1e-4"])
    if unset("optimizer.weight_decay"):
        cfg = apply_overrides(cfg, ["optimizer.weight_decay=0.0"])
    if unset("optimizer.grad_clip"):
        cfg = apply_overrides(cfg, ["optimizer.grad_clip=1.0"])
    if unset("data.samples_per_audio"):
        cfg.data.samples_per_audio = 16
    if unset("trainer.steps"):
        cfg.trainer.steps = 100_000
    if unset("trainer.batch_size"):
        # 8 clips × 16 crops fits a 16 GB v5e chip (the reference's 32×16
        # assumes 80 GB GPUs); effective batch scales with data parallelism
        cfg.trainer.batch_size = 8
    if unset("optimizer.warmup_steps"):
        cfg = apply_overrides(
            cfg, [f"optimizer.warmup_steps={min(5000, cfg.trainer.steps)}"]
        )
    if unset("optimizer.total_steps"):
        cfg = apply_overrides(
            cfg, [f"optimizer.total_steps={cfg.trainer.steps}"]
        )

    print(f"run: Denoise-{cfg.run_identity()}", flush=True)
    from wavjepa_tpu.train.denoise_loop import train_denoiser

    train_denoiser(cfg)


if __name__ == "__main__":
    main()
