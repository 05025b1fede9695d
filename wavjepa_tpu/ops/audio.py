"""Pure-JAX audio utilities: normalization, padding, fading, looping.

These are the device-side counterparts of the reference's host-side helpers
(/root/reference/data_modules/dataset_functions.py, /root/reference/wavjepa/utils.py);
all of them are shape-static and jit-friendly so they can live inside the
fused preprocessing graph on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize_audio_dbfs(audio: jax.Array, target_dbfs: float = -14.0) -> jax.Array:
    """RMS-normalize a waveform to a target dBFS level.

    Silent inputs (zero RMS) are returned unchanged. Matches the reference's
    normalize_audio (dataset_functions.py:30-40, hear_api/feature_helper.py:5-13).
    """
    rms = jnp.sqrt(jnp.mean(jnp.square(audio)))
    gain = 10.0 ** ((target_dbfs - 20.0 * jnp.log10(jnp.maximum(rms, 1e-30))) / 20.0)
    return jnp.where(rms == 0, audio, audio * gain)


def instance_normalize(audio: jax.Array, axis=(-2, -1), eps: float = 1e-5) -> jax.Array:
    """Per-crop zero-mean / unit-std normalization over the given axes.

    Uses the unbiased (ddof=1) std to match torch.Tensor.std as used in the
    reference's on-GPU batch prep (jepa.py:306-308).
    """
    mean = jnp.mean(audio, axis=axis, keepdims=True)
    n = 1
    for a in axis if isinstance(axis, tuple) else (axis,):
        n *= audio.shape[a]
    var = jnp.sum(jnp.square(audio - mean), axis=axis, keepdims=True) / max(n - 1, 1)
    return (audio - mean) / (jnp.sqrt(var) + eps)


def pad_or_truncate(audio: jax.Array, target_len: int, axis: int = -1) -> jax.Array:
    """Zero-pad (at the end) or truncate along ``axis`` to ``target_len``.

    Shape-static: target_len must be a Python int.
    """
    cur = audio.shape[axis]
    axis = axis % audio.ndim
    if cur == target_len:
        return audio
    if cur > target_len:
        idx = [slice(None)] * audio.ndim
        idx[axis] = slice(0, target_len)
        return audio[tuple(idx)]
    pads = [(0, 0)] * audio.ndim
    pads[axis] = (0, target_len - cur)
    return jnp.pad(audio, pads)


def apply_fade(
    audio: jax.Array, fade_len: int, fade_in: bool = True, fade_out: bool = True
) -> jax.Array:
    """Linear fade-in/out over the last axis (reference: generate_scenes.py:13-40)."""
    t = audio.shape[-1]
    fade_len = min(fade_len, t)
    ramp = jnp.linspace(0.0, 1.0, fade_len, dtype=audio.dtype)
    envelope = jnp.ones((t,), dtype=audio.dtype)
    if fade_in:
        envelope = envelope.at[:fade_len].mul(ramp)
    if fade_out:
        envelope = envelope.at[t - fade_len :].mul(ramp[::-1])
    return audio * envelope


def loop_audio(audio: jax.Array, target_len: int) -> jax.Array:
    """Tile a waveform along the last axis until it reaches ``target_len``.

    Counterpart of the reference's `loop` (wavjepa/utils.py); static shapes.
    """
    cur = audio.shape[-1]
    if cur >= target_len:
        return pad_or_truncate(audio, target_len)
    reps = -(-target_len // cur)  # ceil
    tiled = jnp.tile(audio, (1,) * (audio.ndim - 1) + (reps,))
    return pad_or_truncate(tiled, target_len)


def random_crops(
    key: jax.Array, audio: jax.Array, crop_len: int, n_crops: int
) -> jax.Array:
    """Gather ``n_crops`` random fixed-length crops per clip.

    Args:
        key: PRNG key.
        audio: (B, C, L) waveform batch.
        crop_len: crop length in samples (static).
        n_crops: crops per clip (static).

    Returns:
        (B, n_crops, C, crop_len) crops.

    TPU note: vmapped `dynamic_slice` — each crop is one contiguous-window
    slice, which XLA lowers to a cheap dynamic-slice instead of the
    per-element gather a broadcasted `take_along_axis` emits (the reference's
    GPU trick, jepa.py:289-304). Measured on v5e at the bench batch:
    4.1 ms vs 86.7 ms for the gather formulation (21x).
    """
    b, c, l_full = audio.shape
    starts = jax.random.randint(key, (b, n_crops), 0, l_full - crop_len + 1)

    def per_clip(clip, clip_starts):  # (C, L), (n_crops,)
        return jax.vmap(
            lambda s: jax.lax.dynamic_slice_in_dim(clip, s, crop_len, axis=-1)
        )(clip_starts)

    return jax.vmap(per_clip)(audio, starts)  # (B, n_crops, C, crop_len)
