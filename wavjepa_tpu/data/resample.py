"""Kaiser-windowed sinc resampling — host (numpy) and device (JAX) paths.

Replaces torchaudio's ``sinc_interp_kaiser`` resampler, which the reference
uses with lowpass_filter_width=64, rolloff≈0.9476, β≈14.77
(/root/reference/data_modules/WebAudioDataModule.py:50-58) on the host and
for the denoiser's on-GPU 32 k→16 k step (denoiser.py:262-266).

The device path expresses rational-rate polyphase resampling as ONE
`lax.conv_general_dilated` (lhs_dilation = upsample factor, window_strides =
downsample factor) so XLA lowers it to an MXU-friendly strided conv that can
live inside the fused preprocessing graph.
"""

from __future__ import annotations

import math
from functools import lru_cache, partial

import numpy as np


def _kaiser_sinc_kernel(
    sr_in: int, sr_out: int, lowpass_filter_width: int = 64,
    rolloff: float = 0.9475937167399596, beta: float = 14.769656459379492,
) -> tuple[np.ndarray, int, int]:
    """FIR on the upsampled (sr_in·L) grid → (kernel f32, L, M).

    Cutoff f_c = rolloff·min(sr)/2; half-width = lowpass_filter_width
    zero-crossings of the cutoff sinc; Kaiser(β) window; passband gain 1.
    """
    g = math.gcd(sr_in, sr_out)
    L, M = sr_out // g, sr_in // g
    rate_up = sr_in * L
    f_c = rolloff * min(sr_in, sr_out) / 2.0
    half_width_s = lowpass_filter_width / (2.0 * f_c)
    half_taps = int(math.ceil(half_width_s * rate_up))
    t = np.arange(-half_taps, half_taps + 1, dtype=np.float64) / rate_up
    kernel = 2.0 * f_c * np.sinc(2.0 * f_c * t)
    window = np.kaiser(kernel.size, beta)
    # bandlimited-reconstruction scaling: y(t) = Σ x[n]·(2f_c/sr_in)·
    # sinc(2f_c(t−n/sr_in)); zero-stuffing needs no extra gain because only
    # original samples contribute to the sum
    kernel = kernel * window / sr_in
    return kernel.astype(np.float32), L, M


@lru_cache(maxsize=32)
def _cached_kernel(sr_in, sr_out, width, rolloff, beta):
    return _kaiser_sinc_kernel(sr_in, sr_out, width, rolloff, beta)


def resample_np(
    audio: np.ndarray, sr_in: int, sr_out: int, lowpass_filter_width: int = 64,
    rolloff: float = 0.9475937167399596, beta: float = 14.769656459379492,
) -> np.ndarray:
    """Host resampling of (..., T) → (..., ceil(T·sr_out/sr_in)).

    Polyphase via scipy.signal.resample_poly with our Kaiser-sinc FIR —
    scipy scales a user window by ``up`` internally, hence kernel/L. A naive
    dense zero-stuffed convolution here is O(T·L·taps) and takes minutes per
    44.1 k→16 k clip (L=160, ~60 k taps); polyphase is milliseconds.
    Verified to match the device conv path (resample_jax) to ~2e-6.
    """
    if sr_in == sr_out:
        return audio
    kernel, L, M = _cached_kernel(sr_in, sr_out, lowpass_filter_width, rolloff, beta)
    t_in = audio.shape[-1]
    t_out = int(math.ceil(t_in * sr_out / sr_in))
    flat = audio.reshape(-1, t_in).astype(np.float32)
    # first-party native polyphase (data/_native/resampler.cc): identical
    # centered-upfirdn semantics, vectorized FMA inner loops — 9.7 ms per
    # 10-s 44.1 k clip vs 56 ms through scipy.upfirdn (the dominant host
    # ingest cost, CLAUDE.md). scipy remains the fallback when the native
    # lib can't build; the decision is made ONCE (a failed import would
    # otherwise re-run a g++ attempt on every clip) and logged.
    native = _native_resampler()
    if native is not None:
        out = native(flat, kernel, L, M, t_out)
    else:
        from scipy.signal import resample_poly

        out = resample_poly(flat, L, M, axis=-1, window=kernel / L).astype(
            np.float32
        )
        if out.shape[-1] < t_out:
            out = np.pad(out, ((0, 0), (0, t_out - out.shape[-1])))
        out = out[:, :t_out]
    return out.reshape(*audio.shape[:-1], t_out)


_NATIVE_RESAMPLER = "unresolved"


def _native_resampler():
    global _NATIVE_RESAMPLER
    if _NATIVE_RESAMPLER == "unresolved":
        try:
            from wavjepa_tpu.data._native.resample_native import (
                resample_poly_native,
            )

            _NATIVE_RESAMPLER = resample_poly_native
        except Exception as exc:  # noqa: BLE001 - any build/load failure
            print(
                f"[data] native resampler unavailable ({exc!r}); "
                "falling back to scipy (~6x slower host ingest)",
                flush=True,
            )
            _NATIVE_RESAMPLER = None
    return _NATIVE_RESAMPLER


@partial(
    __import__("jax").jit,
    static_argnames=("sr_in", "sr_out", "lowpass_filter_width", "rolloff", "beta"),
)
def resample_jax(
    audio, sr_in: int, sr_out: int, lowpass_filter_width: int = 64,
    rolloff: float = 0.9475937167399596, beta: float = 14.769656459379492,
):
    """Device resampling of (B, C, T) → (B, C, ceil(T·sr_out/sr_in)) as one
    dilated strided convolution (jit/pjit-composable)."""
    import jax
    import jax.numpy as jnp

    if sr_in == sr_out:
        return audio
    kernel, L, M = _cached_kernel(sr_in, sr_out, lowpass_filter_width, rolloff, beta)
    half = kernel.size // 2
    b, c, t_in = audio.shape
    t_out = int(math.ceil(t_in * sr_out / sr_in))

    x = audio.reshape(b * c, 1, t_in)
    k = jnp.asarray(kernel[::-1].copy())[None, None, :]  # OIH; conv = correlation
    y = jax.lax.conv_general_dilated(
        x,
        k,
        window_strides=(M,),
        padding=[(half, half + M * t_out)],
        lhs_dilation=(L,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
    )
    return y[..., :t_out].reshape(b, c, t_out)
