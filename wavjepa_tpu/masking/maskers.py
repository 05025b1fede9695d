"""JEPA block maskers, on-device and shape-static.

Re-designs of the reference maskers (/root/reference/wavjepa/masking.py):

  * `time_inverse_block_masks` ← TimeInverseBlockMasker (masking.py:7-128):
    context = complement of a sampled block mask (p, L), N target group
    masks sampled independently, targets removed from the context, and a
    visible-context-ratio cutoff enforced. The reference rejection-loops
    per sample on CPU; here K candidates are drawn in parallel and the
    first passing one (else the best-ratio one) is selected — static
    shapes, no host round-trip, masks live inside the train-step graph.

  * `speech_masks` ← SpeechMasker (masking.py:131-207): targets only;
    context = complement with runs shorter than ``min_context_len`` dropped.

Return convention (identical to the reference's):
  ctx_mask       (B, T)    True = NOT context (encoder key-padding mask)
  target_masks   (B, N, T) True = target position for that group
  visible_masks  (B, N, T) True = masked for the predictor
                           (= ctx_mask XOR target_masks, masking.py:116)

Channel tiling: the reference tiles masks time-major ("B C S -> B (S C)",
masking.py:120-126) while its channel extractor orders tokens channel-major
((B, C, T', E) flattened on dims 1-2, audio_channel_feature_extractor.py:
177-178) — a latent index mismatch for C>1. This build tiles channel-major
so mask positions actually align with the extractor's token order.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from wavjepa_tpu.masking.span import filter_small_runs, sample_span_masks


@dataclasses.dataclass(frozen=True)
class TimeInverseMaskConfig:
    """configs/masker/AudioSet.yaml defaults."""

    target_masks_per_context: int = 4
    context_mask_prob: float = 0.65
    context_mask_length: int = 10
    target_prob: float = 0.25
    target_length: int = 10
    ratio_cutoff: float = 0.1
    channel_based_masking: bool = False
    n_candidates: int = 4  # parallel replacement for the rejection loop


@dataclasses.dataclass(frozen=True)
class SpeechMaskConfig:
    """configs/masker/LibriSpeech.yaml defaults."""

    target_masks_per_context: int = 4
    target_prob: float = 0.1
    target_length: int = 10
    min_context_len: int = 5
    ratio_cutoff: float = 0.5
    channel_based_masking: bool = False
    n_candidates: int = 4


def _select_candidate(ctx_vis_c, targets_c, ratios, cutoff):
    """Pick the first candidate with ratio >= cutoff, else the best ratio.

    ctx_vis_c: (K, T); targets_c: (K, N, T); ratios: (K,)
    """
    ok = ratios >= cutoff
    first_ok = jnp.argmax(ok)  # first True (argmax returns lowest index)
    best = jnp.argmax(ratios)
    idx = jnp.where(jnp.any(ok), first_ok, best)
    return ctx_vis_c[idx], targets_c[idx]


def _finalize(ctx_visible, targets):
    ctx_mask = ~ctx_visible  # True = masked for the encoder
    visible = jnp.logical_xor(ctx_mask[:, None, :], targets)
    return ctx_mask, targets, visible


def _tile_channels(ctx_mask, targets, visible, in_channels: int):
    """Repeat masks per audio channel, channel-major to match
    ConvChannelFeatureExtractor's token order (see module docstring)."""
    c = in_channels

    def tile2(m):  # (B, T) -> (B, C*T)
        return jnp.tile(m[:, None, :], (1, c, 1)).reshape(m.shape[0], -1)

    def tile3(m):  # (B, N, T) -> (B, N, C*T)
        b, n, t = m.shape
        return jnp.tile(m[:, :, None, :], (1, 1, c, 1)).reshape(b, n, c * t)

    return tile2(ctx_mask), tile3(targets), tile3(visible)


@partial(
    jax.jit,
    static_argnames=("batch_size", "n_times", "in_channels", "cfg"),
)
def time_inverse_block_masks(
    key: jax.Array,
    batch_size: int,
    n_times: int,
    in_channels: int = 1,
    cfg: TimeInverseMaskConfig = TimeInverseMaskConfig(),
):
    """Sample (ctx_mask, target_masks, visible_masks) for a batch.

    ``n_times`` is the total token count; per-channel time length is
    n_times // in_channels (reference masking.py:83).
    """
    t = n_times // in_channels
    n = cfg.target_masks_per_context
    k = cfg.n_candidates
    k_ctx, k_tgt = jax.random.split(key)

    # (B, K, T): candidate context *coverage* masks — context is the complement
    ctx_cov = sample_span_masks(
        k_ctx, (batch_size, k), t, cfg.context_mask_prob, cfg.context_mask_length
    )
    # (B, K, N, T): candidate target group masks
    targets = sample_span_masks(
        k_tgt, (batch_size, k, n), t, cfg.target_prob, cfg.target_length
    )
    any_target = jnp.any(targets, axis=2)  # (B, K, T)
    ctx_visible = ~ctx_cov & ~any_target
    ratios = jnp.mean(ctx_visible.astype(jnp.float32), axis=-1)  # (B, K)

    ctx_sel, tgt_sel = jax.vmap(
        lambda cv, tg, r: _select_candidate(cv, tg, r, cfg.ratio_cutoff)
    )(ctx_visible, targets, ratios)

    ctx_mask, target_masks, visible = _finalize(ctx_sel, tgt_sel)
    if cfg.channel_based_masking and in_channels > 1:
        ctx_mask, target_masks, visible = _tile_channels(
            ctx_mask, target_masks, visible, in_channels
        )
    return ctx_mask, target_masks, visible


@partial(
    jax.jit,
    static_argnames=("batch_size", "n_times", "in_channels", "cfg"),
)
def speech_masks(
    key: jax.Array,
    batch_size: int,
    n_times: int,
    in_channels: int = 1,
    cfg: SpeechMaskConfig = SpeechMaskConfig(),
):
    """SpeechMasker: context = complement of targets, small context runs
    dropped, ratio cutoff enforced (reference masking.py:167-207)."""
    t = n_times // in_channels
    n = cfg.target_masks_per_context
    k = cfg.n_candidates

    targets = sample_span_masks(
        key, (batch_size, k, n), t, cfg.target_prob, cfg.target_length
    )
    any_target = jnp.any(targets, axis=2)  # (B, K, T)
    ctx_visible = jax.vmap(
        jax.vmap(lambda m: filter_small_runs(m, cfg.min_context_len))
    )(~any_target)
    ratios = jnp.mean(ctx_visible.astype(jnp.float32), axis=-1)

    ctx_sel, tgt_sel = jax.vmap(
        lambda cv, tg, r: _select_candidate(cv, tg, r, cfg.ratio_cutoff)
    )(ctx_visible, targets, ratios)

    ctx_mask, target_masks, visible = _finalize(ctx_sel, tgt_sel)
    if cfg.channel_based_masking and in_channels > 1:
        ctx_mask, target_masks, visible = _tile_channels(
            ctx_mask, target_masks, visible, in_channels
        )
    return ctx_mask, target_masks, visible


def format_mask(mask, masked_char: str = "█", visible_char: str = "·") -> str:
    """Pretty-print a boolean mask row for debugging (reference
    wavjepa/utils.py mask printer): True (masked) → block, False → dot."""
    import numpy as np

    row = np.asarray(mask).astype(bool)
    if row.ndim > 1:
        return "\n".join(format_mask(r, masked_char, visible_char) for r in row)
    return "".join(masked_char if m else visible_char for m in row)
