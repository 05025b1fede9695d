"""Analytic FLOP counts for the JEPA training step, for MFU reporting.

Counts USEFUL model FLOPs (matmul/conv multiply-adds ×2): student forward +
teacher forward + backward (2× student forward) — the standard MFU
convention, which excludes rematerialization recompute and elementwise ops.
MFU = (flops/step) / step_time / peak_flops. v5e peak is 197 bf16 TFLOP/s.
"""

from __future__ import annotations

V5E_PEAK_FLOPS = 197e12  # bf16


def conv_output_lengths(conv_spec, in_len: int) -> list[int]:
    outs = []
    t = in_len
    for _, k, s in conv_spec:
        t = (t - k) // s + 1
        outs.append(t)
    return outs


def conv_frontend_flops(conv_spec, in_len: int, in_channels: int = 1) -> int:
    flops, cin, t = 0, in_channels, in_len
    for cout, k, s in conv_spec:
        t = (t - k) // s + 1
        flops += 2 * t * cout * k * cin
        cin = cout
    return flops


def transformer_layer_flops(t: int, d: int, ff: int) -> int:
    proj = 2 * t * d * (3 * d)  # packed QKV
    out = 2 * t * d * d
    attn = 2 * 2 * t * t * d  # QK^T + AV across all heads
    mlp = 2 * 2 * t * d * ff
    return proj + out + attn + mlp


def encoder_path_flops(cfg) -> tuple[int, int, int]:
    """Per-crop (conv, mapper, full-length encoder) forward FLOPs — the
    encoder path shared by the SSL student/teacher and the denoise views."""
    t = cfg.total_patches
    if getattr(cfg, "extractor", "conv") == "conv_channel":
        # per-channel CNN stacks: each channel runs the full spec on 1 input
        # channel (shared-weights variants execute the same FLOPs)
        conv = cfg.in_channels * conv_frontend_flops(
            cfg.conv_spec, cfg.target_length, 1
        )
    else:
        conv = conv_frontend_flops(cfg.conv_spec, cfg.target_length, cfg.in_channels)
    mapper = 2 * t * cfg.embedding_dim * cfg.encoder_dim
    enc_full = cfg.encoder_layers * transformer_layer_flops(
        t, cfg.encoder_dim, int(cfg.encoder_dim * cfg.mlp_ratio)
    )
    return conv, mapper, enc_full


def jepa_forward_flops(cfg, n_targets: int = 4) -> dict:
    """Per-crop forward FLOPs by component for a JEPAConfig-like object.

    Honors visible-token packing (pack_encoder/pack_decoder): FLOPs count
    the work actually executed, so packed runs don't report inflated MFU."""
    t = cfg.total_patches
    pe = getattr(cfg, "pack_encoder", None) or t
    pd = getattr(cfg, "pack_decoder", None) or t
    conv, mapper, enc_full = encoder_path_flops(cfg)
    enc_student = cfg.encoder_layers * transformer_layer_flops(
        pe, cfg.encoder_dim, int(cfg.encoder_dim * cfg.mlp_ratio)
    )
    e2d = 2 * pe * cfg.encoder_dim * cfg.decoder_dim
    dec = n_targets * cfg.decoder_layers * transformer_layer_flops(
        pd, cfg.decoder_dim, int(cfg.decoder_dim * cfg.mlp_ratio)
    )
    d2e = n_targets * 2 * pd * cfg.decoder_dim * cfg.encoder_dim
    student = conv + mapper + enc_student + e2d + dec + d2e
    # the teacher consumes the SAME encode_features output the student
    # computed (train/step.py shares feats via stop_gradient), so conv and
    # mapper are NOT re-run for it — only the EMA encoder at full length
    teacher = enc_full
    return {"student": student, "teacher": teacher}


def jepa_step_flops(cfg, n_crops: int, n_targets: int = 4) -> int:
    """Useful FLOPs of one train step at `n_crops` crops: student fwd +
    teacher fwd + 2× student fwd (backward)."""
    f = jepa_forward_flops(cfg, n_targets)
    return n_crops * (3 * f["student"] + f["teacher"])


def denoise_step_flops(
    cfg, n_crops: int, alpha: float | None = None, clean_forward: bool = True
) -> int:
    """Executed FLOPs of one denoise-distillation step at ``n_crops`` total
    crops (clips × samples_per_audio): the student is the JEPA encoder path
    at FULL length (no masking → no packing), run fwd+bwd on BOTH the clean
    and noisy views, plus one frozen-teacher forward on the clean view
    (train/denoise_step.py). At the blend endpoints (``alpha`` 0.0 or 1.0)
    the dead view's backward is pruned by the stop_gradient optimization in
    denoise_step.py, so it counts forward-only. Scene FFTs / resampling are
    elementwise-ish and excluded by the matmul-only convention."""
    conv, mapper, enc = encoder_path_flops(cfg)
    fwd = conv + mapper + enc
    if alpha is not None and float(alpha) in (0.0, 1.0):
        # dead view fwd-only (or skipped entirely when it is the clean view
        # and log_clean_loss=False) + live view fwd+bwd + teacher fwd
        dead = fwd if (clean_forward or float(alpha) == 1.0) else 0
        return n_crops * (dead + 3 * fwd + fwd)
    return n_crops * (2 * 3 * fwd + fwd)  # 2 views fwd+bwd + teacher fwd


def mfu(flops_per_step: int, step_seconds: float, peak: float = V5E_PEAK_FLOPS) -> float:
    return flops_per_step / step_seconds / peak
