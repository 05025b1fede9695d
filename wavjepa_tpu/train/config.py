"""Structured configuration tree (data / optimizer / trainer / extractor /
masker groups) with YAML files and dotted CLI overrides.

Replaces the reference's Hydra+OmegaConf setup (/root/reference/configs/,
train.py:225) with plain dataclasses:
  * conv specs are structured lists of (dim, kernel, stride) — the reference
    `eval`'s Python strings from YAML (train.py:62), which SURVEY.md flags
    to replace;
  * `run_identity()` reproduces the reference's config-derived run naming
    (utils.py:1-23) for checkpoint/log paths.

Usage:
    cfg = load_config()                          # all defaults
    cfg = load_config("configs/librispeech.yaml")
    cfg = apply_overrides(cfg, ["masker.name=speech-masker",
                                "trainer.batch_size=64"])
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Optional

from wavjepa_tpu.masking import SpeechMaskConfig, TimeInverseMaskConfig
from wavjepa_tpu.ops.conv_frontend import WAV2VEC2_CONV_SPEC, WAVJEPA_CONV_SPEC
from wavjepa_tpu.train.step import EMAConfig, OptimizerConfig


@dataclasses.dataclass
class DataConfig:
    name: str = "AudioSet"
    data_dirs: Any = ""  # shard pattern(s): str or list[str]
    mixing_weights: Optional[list[float]] = None
    sr: int = 16000
    in_channels: int = 1
    samples_per_audio: int = 8
    process_seconds: float = 2.01
    target_seconds: float = 10.0
    # denoise / Nat scene synthesis
    noise_dir: str = ""
    rir_dir: str = ""
    with_rir: bool = True
    with_noise: bool = True
    # WavJEPA-Nat: synthesize multi-channel scenes on device inside the SSL
    # step (requires in_channels 2/4 + rir_dir/noise_dir, or synthetic)
    nat_scenes: bool = False
    snr_low: float = -5.0
    snr_high: float = 5.0
    # host pipeline
    num_workers: int = 16
    shuffle_buffer: int = 1000
    prefetch: int = 2
    # host→device wire format for SSL clip batches: int16 quarters the
    # transfer bytes and is exact under the step's per-crop instance norm
    # (data/pipeline.quantize_clip_int16; measured: the f32 batch transfer
    # alone cost a full step time on the 40 MB/s axon link, PERF.md r4)
    transfer_dtype: str = "int16"
    # device-resident scene banks for denoise/Nat ingest (VERDICT r4 #1):
    # ship rir_bank_size RIR stacks / noise_bank_size faded-noise rows once,
    # then 4-byte per-clip indices instead of ~0.5-3 MB of f32 RIRs and the
    # 0.6-1.3 MB placed-noise buffer per clip; refresh rir_refresh_per_batch
    # fresh stacks/rows per batch per bank (ring buffers) so long runs track
    # the side-channel streams. 0 disables (payloads ship inline).
    rir_bank_size: int = 64
    noise_bank_size: int = 64
    rir_refresh_per_batch: int = 1
    synthetic: bool = False  # random-audio source for smoke tests/benchmarks


@dataclasses.dataclass
class ExtractorConfig:
    name: str = "wavjepa"  # "wavjepa" | "wav2vec2" | custom
    conv_spec: Optional[list[list[int]]] = None  # [[dim, k, stride], ...]
    mode: str = "default"
    conv_bias: bool = False
    depthwise: bool = False
    channel_wise: bool = False  # per-channel CNNs (Nat)
    share_weights_over_channels: bool = False
    pos_embed: str = "time"  # "time" | "binaural" (Nat)

    def resolved_spec(self) -> tuple[tuple[int, int, int], ...]:
        if self.conv_spec is not None:
            return tuple(tuple(layer) for layer in self.conv_spec)
        return {
            "wavjepa": WAVJEPA_CONV_SPEC,
            "wav2vec2": WAV2VEC2_CONV_SPEC,
        }[self.name]


@dataclasses.dataclass
class MaskerConfig:
    name: str = "time-inverse"  # "time-inverse" | "speech-masker"
    target_masks_per_context: int = 4
    context_mask_prob: float = 0.65
    context_mask_length: int = 10
    target_prob: float = 0.25
    target_length: int = 10
    ratio_cutoff: float = 0.1
    min_context_len: int = 5
    channel_based_masking: bool = False

    def build(self):
        """→ (masker_fn, masker_cfg) for train/step.py."""
        from wavjepa_tpu.masking import speech_masks, time_inverse_block_masks

        if self.name == "speech-masker":
            return speech_masks, SpeechMaskConfig(
                target_masks_per_context=self.target_masks_per_context,
                target_prob=self.target_prob,
                target_length=self.target_length,
                min_context_len=self.min_context_len,
                ratio_cutoff=self.ratio_cutoff,
                channel_based_masking=self.channel_based_masking,
            )
        return time_inverse_block_masks, TimeInverseMaskConfig(
            target_masks_per_context=self.target_masks_per_context,
            context_mask_prob=self.context_mask_prob,
            context_mask_length=self.context_mask_length,
            target_prob=self.target_prob,
            target_length=self.target_length,
            ratio_cutoff=self.ratio_cutoff,
            channel_based_masking=self.channel_based_masking,
        )


@dataclasses.dataclass
class TrainerConfig:
    steps: int = 375_000
    batch_size: int = 32  # clips per step per data-parallel group member
    precision: str = "bf16"  # "bf16" | "f32"
    size: str = "base"  # "base" | "large"
    average_top_k_layers: int = 8
    num_devices: int = 0  # 0 = all visible
    model_parallel: int = 1
    # remat must stay on for the base config at batch 256 on 16 GB chips
    # (see models/jepa.py JEPAConfig.remat)
    remat: bool = True
    # per-stack remat overrides (None = auto: when packing is enabled the
    # freed HBM is spent disabling conv-frontend and encoder remat — skips
    # their backward replays, measured 842 -> 794 ms; decoder remat stays on,
    # its probs/residuals don't fit)
    remat_conv: Optional[bool] = None
    remat_encoder: Optional[bool] = None
    remat_decoder: Optional[bool] = None
    # keep attention probabilities as remat residuals (measured SLOWER at
    # the packed bench config — memory traffic exceeds the replay saved —
    # but exposed for other shapes/HBM budgets)
    remat_save_probs: bool = False
    # visible-token packing (JEPAConfig.pack_encoder/pack_decoder):
    # "auto" derives static pack sizes from the time-inverse masker config
    # and snaps the decoder budget to 128 for the single-MXU-N-tile regime
    # (targets always packed; rare tail context drops, see packing_bounds);
    # "exact" keeps the hard upper bound (no drops ever); "off" disables.
    # Speech-masker runs get no packing (its context is ~90% of tokens).
    pack_tokens: str = "auto"
    # >1 splits each step's crop batch into sequential microbatches inside
    # one jitted program (exact: global loss normalizer preserved — see
    # train/step.py). Lets remat_decoder=false fit the 256-crop batch by
    # holding only one microbatch's activations. 0 = auto: at the reference
    # batch (>=256 crops) pick the largest of 16/8/4/2 dividing the crop
    # count and disable decoder remat — measured v5e r3 at 256 crops
    # (ms/step): accum 1+remat 778, 2→640, 4→544, 8→532, 16→500 (64.0
    # clips/s/chip), 32→590 (8-crop microbatches underfill the MXU);
    # smaller batches keep the single-pass step.
    accum_steps: int = 0
    # attention lowering: "auto" | "einsum" | "pallas" | "fused_block"
    # (ops/transformer.py). Training default einsum — measured fastest
    # fwd+bwd at every bench shape (PERF.md round 3).
    attn_impl: str = "auto"
    # decoder-stack override (None = follow attn_impl). fused_block here is
    # 1.50x fwd at the packed decoder shape but slower in training.
    attn_impl_decoder: Optional[str] = None
    ckpt_every: int = 25_000
    keep_ckpts: int = 0  # 0 = keep all (reference save_top_k=-1)
    log_every: int = 50
    save_dir: str = "runs"
    seed: int = 42


@dataclasses.dataclass
class Config:
    model: str = "JEPA"  # "JEPA" | "Denoiser"
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    extractor: ExtractorConfig = dataclasses.field(default_factory=ExtractorConfig)
    masker: MaskerConfig = dataclasses.field(default_factory=MaskerConfig)
    optimizer: OptimizerConfig = dataclasses.field(default_factory=OptimizerConfig)
    ema: EMAConfig = dataclasses.field(default_factory=EMAConfig)
    trainer: TrainerConfig = dataclasses.field(default_factory=TrainerConfig)
    # denoiser-only
    alpha: float = 0.0
    teacher_ckpt: str = ""
    # False + alpha=0 skips the diagnostics-only clean student forward
    # (loss_clean logged as 0; training dynamics unchanged — denoiser.py)
    log_clean_loss: bool = True
    # dotted keys the user set explicitly (YAML file or CLI override) —
    # consumers that layer defaults (denoise.py, denoise_loop) must never
    # clobber these. Populated by load_config/apply_overrides.
    explicit_keys: set = dataclasses.field(
        default_factory=set, repr=False, compare=False
    )

    def run_identity(self) -> str:
        """Hierarchical run name from config (reference utils.py:1-23)."""
        m = self.masker
        return "/".join(
            [
                f"Data={self.data.name}",
                f"Extractor={self.extractor.name}",
                f"InSeconds={self.data.process_seconds}",
                f"BatchSize={self.trainer.batch_size}",
                f"NrSamples={self.data.samples_per_audio}",
                f"ModelSize={self.trainer.size}",
                f"LR={self.optimizer.lr}",
                f"Masking={m.name}",
                f"TargetProb={m.target_prob}",
                f"TargetLen={m.target_length}",
                f"TopK={self.trainer.average_top_k_layers}",
            ]
        )

    def packing_bounds(self, total_patches: int) -> tuple:
        """(pack_encoder, pack_decoder) for the time-inverse masker, or
        (None, None).

        The encoder budget is derived EMPIRICALLY from this run's masker
        configuration: the numpy twin of the span sampler (statistically
        validated against the device sampler in tests/test_masking.py) is
        drawn 16384 times and the p99.9 visible-context count plus one
        context-span length becomes the budget (= 88 at the AudioSet
        defaults, covering the measured max of 87 over 82k device samples). The train step
        canonicalizes the residual tail. If most tokens stay visible
        (>72% — e.g. low-probability maskers), packing is disabled rather
        than silently truncating context.

        The decoder budget is the encoder budget + the masker's maximum
        target coverage (a hard bound, always exact); under "auto" it snaps
        down to 128 (single MXU N-tile, measured 1297 -> 942 ms) only when
        the sampled fraction of per-group visible counts above 128 is
        <=3e-4, so the targets-first overflow drop stays a ~1e-4 tail
        event."""
        m = self.masker
        if self.trainer.pack_tokens not in ("auto", "exact", "off"):
            raise ValueError(
                f"trainer.pack_tokens must be 'auto', 'exact' or 'off', got "
                f"{self.trainer.pack_tokens!r} (note: YAML booleans parse as "
                f"bool, quote the string)"
            )
        if self.trainer.pack_tokens == "off" or m.name != "time-inverse":
            return None, None
        c = self.data.in_channels if m.channel_based_masking else 1
        c = max(1, c)
        t = total_patches // c
        import numpy as _np

        ctx_counts, grp_counts = _sampled_visible_stats(
            t, m.context_mask_prob, m.context_mask_length,
            m.target_prob, m.target_length, m.target_masks_per_context,
        )
        # budget = sampled p99.9 + one context-span length, rounded up to 8:
        # a quantile is a stable statistic where a sampled max is not, and
        # the span-length margin absorbs the deep tail (AudioSet defaults:
        # q99.9 ≈ 72 + 10 → 88, covering the device-measured max of 87 over
        # 82k samples). Beyond-tail overflow a 375k-step run could still see
        # is canonicalized exactly by the train step.
        q999 = float(_np.percentile(ctx_counts, 99.9))
        pe = min(t, -(-int(q999 + m.context_mask_length) // 8) * 8)
        if pe >= 0.72 * t:
            return None, None
        max_tgt = (
            int(m.target_prob * t / m.target_length) + 1
        ) * m.target_length
        pd = min(t, -(-(pe + max_tgt) // 8) * 8)
        # snap only when the SAMPLED exceedance fraction over the snap point
        # is in the ~1e-4 tail (<=3e-4; device-measured at the AudioSet
        # defaults: p99.99 = 125, max 137 over 82k samples) — a
        # deep-percentile estimate from the sample is too noisy, an
        # exceedance count is not. The snap point never goes below the hard
        # target bound (ceil8(max_tgt)): with targets packed first, overflow
        # can then only ever drop CONTEXT keys — target terms can never fall
        # out of the pack, so the packed loss numerator stays exact.
        snap = max(128, -(-max_tgt // 8) * 8)
        frac_over = float((grp_counts > snap).mean())
        if (
            self.trainer.pack_tokens == "auto"
            and snap <= pd
            and frac_over <= 3e-4
            and t > 160
        ):
            if frac_over > 0.0 and not getattr(self, "_warned_pack_snap", False):
                import logging

                logging.getLogger(__name__).warning(
                    "pack_tokens=auto snaps pack_decoder %d -> %d; sampled "
                    "fraction of decoder groups over the budget = %.2e "
                    "(positionally-last context keys drop in that tail)",
                    pd, snap, frac_over,
                )
                object.__setattr__(self, "_warned_pack_snap", True)
            pd = snap
        return pe * c, pd * c

    def resolved_accum_steps(self) -> int:
        """Gradient-accumulation microbatch count (trainer.accum_steps with
        0 = auto). Auto engages only at the reference-scale crop batch
        (>=256 = trainer.batch_size * data.samples_per_audio) where the
        measured win exists, picking the largest of 16/8/4/2 that divides
        it (sweep: accum 16 = 499.6 ms vs 8 = 532 ms at 256 crops)."""
        a = self.trainer.accum_steps
        if a != 0:
            return a
        crops = self.trainer.batch_size * self.data.samples_per_audio
        # channel-wise (Nat) crops carry in_channels× the tokens, so weigh
        # them accordingly when judging "reference scale"
        if crops * self.data.in_channels >= 256:
            for cand in (16, 8, 4, 2):
                if crops % cand == 0:
                    return cand
        return 1

    def resolved_denoise_accum_steps(self) -> int:
        """Denoise-path accumulation (trainer.accum_steps with 0 = auto).

        The denoise step has no decoder and no packing, so its optimum
        differs from SSL's 16. Measured v5e r3 at the reference 256-crop
        batch (32 clips x 8 crops, ms/step): accum 1 + full remat 891,
        then with remat off: 2 -> 734, **4 -> 657** (48.7 clips/s/chip,
        vs_baseline 1.314), 8 -> 685, 16 -> 677. Auto engages at >=128-crop
        batches, picking the largest of 4/2 that divides the crop count."""
        a = self.trainer.accum_steps
        if a != 0:
            return a
        crops = self.trainer.batch_size * self.data.samples_per_audio
        if crops >= 128:
            for cand in (4, 2):
                if crops % cand == 0:
                    return cand
        return 1

    def build_denoise_model_config(self):
        """JEPAConfig for the denoise path.

        Packing stays off (it is a masking-time concept; the denoise step
        runs full sequences), and when microbatching is on and the user left
        remat on auto, remat goes fully off — one microbatch's activations
        fit without backward replays (measured 891 -> 657 ms, see
        resolved_denoise_accum_steps). Explicit trainer.remat* settings
        always win."""
        import dataclasses as _dc

        cfg = self._base_model_config()
        tr = self.trainer
        if (
            self.resolved_denoise_accum_steps() > 1
            and "trainer.remat" not in self.explicit_keys
        ):
            cfg = _dc.replace(cfg, remat=False)
        return _dc.replace(
            cfg,
            **{
                k: v
                for k in ("remat_conv", "remat_encoder", "remat_decoder")
                if (v := getattr(tr, k)) is not None
            },
            remat_save_probs=tr.remat_save_probs,
            attn_impl=tr.attn_impl,
            attn_impl_decoder=tr.attn_impl_decoder,
        )

    def build_model_config(self):
        """Assemble the JEPAConfig for this run."""
        import dataclasses as _dc

        cfg = self._base_model_config()
        pe, pd = self.packing_bounds(cfg.total_patches)
        if pe is not None:
            cfg = _dc.replace(cfg, pack_encoder=pe, pack_decoder=pd)
        tr = self.trainer
        remat_conv = tr.remat_conv
        remat_enc = tr.remat_encoder
        remat_dec = tr.remat_decoder
        if pe is not None and tr.remat:
            # packing freed the HBM these replays were trading for
            remat_conv = False if remat_conv is None else remat_conv
            remat_enc = False if remat_enc is None else remat_enc
        if self.resolved_accum_steps() > 1 and remat_dec is None:
            # microbatching holds one microbatch's activations: skip the
            # decoder's backward replay too (532 vs 778 ms at 256 crops)
            remat_dec = False
        cfg = _dc.replace(
            cfg,
            remat_conv=remat_conv,
            remat_encoder=remat_enc,
            remat_decoder=remat_dec,
            remat_save_probs=tr.remat_save_probs,
            attn_impl=tr.attn_impl,
            attn_impl_decoder=tr.attn_impl_decoder,
        )
        return cfg

    def _base_model_config(self):
        import jax.numpy as jnp

        from wavjepa_tpu.models.jepa import JEPAConfig

        return JEPAConfig(
            conv_spec=self.extractor.resolved_spec(),
            in_channels=self.data.in_channels,
            extractor="conv_channel" if self.extractor.channel_wise else "conv",
            extractor_mode=self.extractor.mode,
            conv_bias=self.extractor.conv_bias,
            share_weights_over_channels=self.extractor.share_weights_over_channels,
            pos_embed=self.extractor.pos_embed,
            size=self.trainer.size,
            sample_rate=self.data.sr,
            process_seconds=self.data.process_seconds,
            average_top_k_layers=self.trainer.average_top_k_layers,
            dtype=jnp.bfloat16 if self.trainer.precision == "bf16" else jnp.float32,
            remat=self.trainer.remat,
        )


_VISIBLE_STATS_CACHE: dict = {}


def _batch_span_masks(rng, n_rows: int, t: int, prob: float, length: int):
    """Vectorized twin of masking.span.sample_span_mask_np: (n_rows, t) bool
    masks, each the union of `floor(prob·t/length + U)` random spans of
    `length` placed without replacement. Distribution-identical to the
    per-draw loop (the k smallest of iid uniform keys form a uniform random
    k-subset). f32 keys: float64 generation is pathologically slow on some
    hosts (measured 4.5 s vs 64 ms for this shape) and key ties are a
    ~0.1%-per-row non-event for a statistical bound. Span coverage via
    +1/-1 boundary marks and a cumsum — no per-element scatter."""
    import numpy as np

    base = prob * t / length
    dom = max(1, t - length)
    nums = np.minimum(
        np.floor(base + rng.random(n_rows, dtype=np.float32)).astype(np.int64),
        dom,
    )
    mmax = int(min(int(base) + 1, dom))
    keys = rng.random((n_rows, dom), dtype=np.float32)
    if mmax >= dom:
        starts = np.argsort(keys, axis=1)[:, :mmax]
    else:
        starts = np.argpartition(keys, mmax, axis=1)[:, :mmax]
    valid = np.arange(mmax)[None, :] < nums[:, None]  # (n_rows, mmax)
    # boundary marks: +1 at span start, -1 one past span end; covered where
    # the running sum is positive
    w = t + length
    rows = np.broadcast_to(np.arange(n_rows)[:, None], starts.shape)
    lin = rows[valid].astype(np.int64) * w + starts[valid]
    marks = np.bincount(lin, minlength=n_rows * w) - np.bincount(
        lin + length, minlength=n_rows * w
    )
    return np.cumsum(marks.reshape(n_rows, w)[:, :t], axis=1) > 0


def _sampled_visible_stats(
    t: int, ctx_prob: float, ctx_len: int, tgt_prob: float, tgt_len: int,
    n_targets: int, n_samples: int = 16384, seed: int = 0,
):
    """(visible-context counts, per-group visible counts) sample arrays
    under the time-inverse masker, via vectorized span sampling.
    Deterministic (fixed seed) and cached per configuration.

    Limitation: this samples the UNCONDITIONED span distribution; the device
    masker additionally selects the first of K=4 candidates passing the
    ratio cutoff (maskers.py), which conditions the deployed distribution.
    At the AudioSet defaults the shift is negligible (budgets validated
    against 82k device samples — max 87 visible vs budget 88) and the
    span-length margin absorbs it; for exotic configs with high rejection
    rates prefer pack_tokens="exact" or "off"."""
    key = (t, ctx_prob, ctx_len, tgt_prob, tgt_len, n_targets, n_samples, seed)
    if key in _VISIBLE_STATS_CACHE:
        return _VISIBLE_STATS_CACHE[key]
    import numpy as np

    rng = np.random.default_rng(seed)
    cover = _batch_span_masks(rng, n_samples, t, ctx_prob, ctx_len)
    tgts = _batch_span_masks(
        rng, n_samples * n_targets, t, tgt_prob, tgt_len
    ).reshape(n_samples, n_targets, t)
    vis = ~cover & ~tgts.any(axis=1)  # (n, t) visible context
    nv = vis.sum(axis=1)
    # targets are disjoint from the visible context by construction, so a
    # group's visible count is the plain sum
    grp = nv + tgts.sum(axis=2).max(axis=1)
    out = (nv.astype(np.int64), grp.astype(np.int64))
    _VISIBLE_STATS_CACHE[key] = out
    return out


# --------------------------------------------------------------- (de)serialize


def _from_dict(cls, data: dict):
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for key, value in data.items():
        if key not in fields:
            raise KeyError(f"unknown config key '{key}' for {cls.__name__}")
        ftype = fields[key].type
        sub = _SUBCONFIGS.get((cls, key))
        kwargs[key] = _from_dict(sub, value) if sub and isinstance(value, dict) else value
    return cls(**kwargs)


_SUBCONFIGS = {
    (Config, "data"): DataConfig,
    (Config, "extractor"): ExtractorConfig,
    (Config, "masker"): MaskerConfig,
    (Config, "optimizer"): OptimizerConfig,
    (Config, "ema"): EMAConfig,
    (Config, "trainer"): TrainerConfig,
}


def load_config(
    path: Optional[str] = None, data: Optional[dict] = None
) -> Config:
    """Build a Config from a YAML file path or an already-parsed dict
    (callers that also need the raw keys — e.g. denoise.py's
    default-layering — parse once and pass `data`)."""
    if data is None:
        if path is None:
            return Config()
        import yaml

        data = yaml.safe_load(Path(path).read_text()) or {}
    cfg = _from_dict(Config, data)

    def _walk(d: dict, prefix: str = ""):
        for k, v in (d or {}).items():
            key = f"{prefix}{k}"
            if isinstance(v, dict):
                _walk(v, key + ".")
            else:
                cfg.explicit_keys.add(key)

    _walk(data)
    return cfg


def _optional_base(decl: Any) -> Any:
    """Optional[X] → X (None if `decl` is not a 1-type Optional)."""
    import typing

    args = typing.get_args(decl)
    non_none = [a for a in args if a is not type(None)]
    if type(None) in args and len(non_none) == 1:
        return non_none[0]
    return None


def _is_optional(decl: Any) -> bool:
    import typing

    return type(None) in typing.get_args(decl)


def _coerce(value: str, current: Any, decl: Any = None) -> Any:
    if value.lower() in ("null", "none"):
        # must precede the bool branch: an Optional[bool] currently holding
        # True would otherwise coerce "null" to False instead of clearing it.
        # Only Optional fields (or fields already holding None) may be
        # cleared — "trainer.steps=null" on a plain int must fail loudly here
        # rather than surface later as an opaque TypeError on None.
        if current is None or decl is None or _is_optional(decl):
            return None
        raise ValueError(
            f"cannot set non-Optional field (declared {decl!r}) to {value!r}"
        )
    if isinstance(current, bool):
        return value.lower() in ("1", "true", "yes")
    if isinstance(current, int) and not isinstance(current, bool):
        return int(value)
    if isinstance(current, float):
        return float(value)
    if value.startswith(("[", "{")):
        return json.loads(value)
    # Fields whose current value is None (Optional[...] defaults, e.g.
    # trainer.remat_encoder) carry no type information in `current`, so
    # dispatch on the DECLARED field type — "=false" on Optional[bool] must
    # become False (not the truthy string "false"), while "=1" on a future
    # Optional[int] must become int 1 (not True).
    if current is None:
        base = _optional_base(decl) if decl is not None else None
        if base is bool:
            return value.lower() in ("1", "true", "yes")
        if base is int:
            return int(value)
        if base is float:
            return float(value)
        if base is None and value.lower() in ("true", "false", "yes", "no"):
            return value.lower() in ("true", "yes")
    return value


def apply_overrides(cfg: Config, overrides: list[str]) -> Config:
    """Hydra-style dotted overrides: ``trainer.batch_size=64``.

    Frozen sub-configs (optimizer/ema) are rebuilt via dataclasses.replace.
    """
    for item in overrides:
        if "=" not in item:
            raise ValueError(f"override '{item}' is not key=value")
        dotted, value = item.split("=", 1)
        keys = dotted.split(".")
        objs = [cfg]
        for key in keys[:-1]:
            objs.append(getattr(objs[-1], key))
        leaf_obj, leaf_key = objs[-1], keys[-1]
        current = getattr(leaf_obj, leaf_key)
        decl = None
        if dataclasses.is_dataclass(leaf_obj):
            import typing

            try:
                decl = typing.get_type_hints(type(leaf_obj)).get(leaf_key)
            except Exception:
                decl = None
        new_value = _coerce(value, current, decl)
        cfg.explicit_keys.add(dotted)
        # rebuild frozen dataclasses bottom-up
        updated = new_value
        for obj, key in zip(reversed(objs), reversed(keys)):
            if dataclasses.is_dataclass(obj) and obj.__dataclass_params__.frozen:
                updated = dataclasses.replace(obj, **{key: updated})
            else:
                setattr(obj, key, updated)
                break
    return cfg


def config_to_dict(cfg) -> dict:
    d = dataclasses.asdict(cfg)
    d.pop("explicit_keys", None)  # bookkeeping, not configuration
    return d
