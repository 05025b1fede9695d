"""Native polyphase resampler (data/_native/resampler.cc): bit-level parity
with the scipy path it replaces, across decimation/interpolation/rational
rates, multirow inputs, and edge lengths."""

import math

import numpy as np
import pytest

from wavjepa_tpu.data.resample import _cached_kernel, resample_np

KAISER = dict(
    lowpass_filter_width=64,
    rolloff=0.9475937167399596,
    beta=14.769656459379492,
)


def _scipy_reference(audio, sr_in, sr_out):
    from scipy.signal import resample_poly

    kernel, L, M = _cached_kernel(sr_in, sr_out, *KAISER.values())
    t_out = int(math.ceil(audio.shape[-1] * sr_out / sr_in))
    flat = audio.reshape(-1, audio.shape[-1]).astype(np.float32)
    out = resample_poly(flat, L, M, axis=-1, window=kernel / L).astype(np.float32)
    if out.shape[-1] < t_out:
        out = np.pad(out, ((0, 0), (0, t_out - out.shape[-1])))
    return out[:, :t_out].reshape(*audio.shape[:-1], t_out)


@pytest.fixture(scope="module")
def native():
    mod = pytest.importorskip("wavjepa_tpu.data._native.resample_native")
    return mod


@pytest.mark.parametrize(
    "sr_in,sr_out",
    [(44100, 16000), (48000, 16000), (22050, 16000), (32000, 16000),
     (16000, 32000), (8000, 16000), (24000, 16000)],
)
def test_matches_scipy(native, sr_in, sr_out):
    rng = np.random.default_rng(sr_in % 97)
    x = rng.standard_normal((2, sr_in)).astype(np.float32)
    kernel, L, M = _cached_kernel(sr_in, sr_out, *KAISER.values())
    t_out = int(math.ceil(x.shape[-1] * sr_out / sr_in))
    ref = _scipy_reference(x, sr_in, sr_out)
    nat = native.resample_poly_native(x, kernel, L, M, t_out)
    assert nat.shape == ref.shape
    np.testing.assert_allclose(nat, ref, atol=5e-6, rtol=1e-5)


def test_resample_np_uses_native_and_matches(native):
    """resample_np routes through the native path and stays within tolerance
    of the scipy formulation (and hence of the device conv path, which was
    validated against scipy in round 1)."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 44100 * 3)).astype(np.float32)
    out = resample_np(x, 44100, 16000)
    ref = _scipy_reference(x, 44100, 16000)
    assert out.shape == ref.shape == (1, 48000)
    np.testing.assert_allclose(out, ref, atol=5e-6, rtol=1e-5)


def test_sine_tone_preserved(native):
    """A passband tone survives resampling with the right frequency/level."""
    sr_in, sr_out, f = 44100, 16000, 440.0
    t = np.arange(sr_in * 2) / sr_in
    x = np.sin(2 * np.pi * f * t).astype(np.float32)[None]
    y = resample_np(x, sr_in, sr_out)[0]
    t2 = np.arange(y.size) / sr_out
    expect = np.sin(2 * np.pi * f * t2)
    # ignore filter edges
    n = y.size
    sl = slice(n // 10, -n // 10)
    np.testing.assert_allclose(y[sl], expect[sl], atol=5e-3)


def test_short_input(native):
    """Inputs shorter than the filter half-width still resample sanely."""
    rng = np.random.default_rng(5)
    x = rng.standard_normal((1, 500)).astype(np.float32)
    out = resample_np(x, 44100, 16000)
    ref = _scipy_reference(x, 44100, 16000)
    np.testing.assert_allclose(out, ref, atol=5e-6, rtol=1e-5)
