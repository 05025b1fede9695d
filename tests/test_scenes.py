"""Scene-synthesis ops: FFT convolution parity, segmental-SNR mixing math,
case dispatch (vs the reference generate_scenes_batch semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavjepa_tpu.ops.scenes import (
    _fft_len,
    add_noise,
    aggregate_noise,
    convolve_with_rir,
    fft_convolve_full_trunc,
    generate_scene,
)


def test_fft_convolve_matches_numpy_full_mode():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 400)).astype(np.float32)
    k = rng.standard_normal((3, 64)).astype(np.float32)
    out = np.asarray(fft_convolve_full_trunc(jnp.asarray(x), jnp.asarray(k)))
    for i in range(3):
        ref = np.convolve(x[i], k[i], mode="full")[:400]
        np.testing.assert_allclose(out[i], ref, atol=1e-3, rtol=1e-4)


def test_fft_len_granule_contract():
    # Above 4096: tightest multiple of 4096 (measured fastest on the TPU
    # FFT, see _fft_len docstring); at or below: next power of two.
    assert _fft_len(383999) == 385024  # the shipped Nat scene shape
    assert _fft_len(4097) == 8192
    assert _fft_len(8192) == 8192
    assert _fft_len(400 + 64 - 1) == 512
    for n in (1, 400, 4096, 4097, 12000, 383999):
        assert _fft_len(n) >= n


def test_fft_convolve_exact_on_granule_path():
    # n = t + l - 1 > 4096 exercises the 4096-granule padding branch; the
    # result must still be the exact truncated full-mode convolution.
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 5000)).astype(np.float32)
    k = rng.standard_normal((2, 700)).astype(np.float32)
    out = np.asarray(fft_convolve_full_trunc(jnp.asarray(x), jnp.asarray(k)))
    for i in range(2):
        ref = np.convolve(x[i], k[i], mode="full")[:5000]
        np.testing.assert_allclose(out[i], ref, atol=2e-3, rtol=1e-4)


def test_convolve_with_rir_shapes_and_identity_kernel():
    rng = np.random.default_rng(1)
    wav = rng.standard_normal((2, 300)).astype(np.float32)
    # delta RIR = identity
    rir = np.zeros((2, 1, 50), np.float32)
    rir[:, :, 0] = 1.0
    out = np.asarray(convolve_with_rir(jnp.asarray(wav), jnp.asarray(rir)))
    assert out.shape == (2, 1, 300)
    np.testing.assert_allclose(out[:, 0], wav, atol=1e-4)


def test_aggregate_noise_sums_sources_and_ignores_zero_rirs():
    rng = np.random.default_rng(2)
    noise = rng.standard_normal((2, 256)).astype(np.float32)
    rirs = np.zeros((2, 5, 1, 32), np.float32)
    rirs[:, 0, :, 0] = 1.0  # source 0: delta
    rirs[:, 1, :, 0] = 2.0  # source 1: 2x delta
    # sources 2-4 are zero rows (absent)
    out = np.asarray(aggregate_noise(jnp.asarray(rirs), jnp.asarray(noise)))
    np.testing.assert_allclose(out[:, 0], 3.0 * noise, atol=1e-3)


@pytest.mark.parametrize("snr_db", [-5.0, 0.0, 10.0])
def test_add_noise_hits_target_segmental_snr(snr_db):
    rng = np.random.default_rng(3)
    b, t = 2, 1000
    source = rng.standard_normal((b, 1, t)).astype(np.float32)
    noise = rng.standard_normal((b, 1, t)).astype(np.float32)
    start = np.array([100, 0], np.int32)
    length = np.array([500, 1000], np.int32)
    mixed = np.asarray(
        add_noise(
            jnp.asarray(source), jnp.asarray(noise),
            jnp.full((b,), snr_db, jnp.float32),
            jnp.asarray(start), jnp.asarray(length),
        )
    )
    added = mixed - source
    for i in range(b):
        sl = slice(start[i], start[i] + length[i])
        e_sig = np.sum(source[i, 0, sl] ** 2)
        e_noise = np.sum(added[i, 0, sl] ** 2)
        measured = 10 * np.log10(e_sig / e_noise)
        assert abs(measured - snr_db) < 0.1


def test_generate_scene_case_dispatch():
    rng = np.random.default_rng(4)
    b, t = 2, 512
    src = jnp.asarray(rng.standard_normal((b, t)).astype(np.float32))
    rir = np.zeros((b, 1, 64), np.float32)
    rir[:, :, 0] = 1.0
    rir = jnp.asarray(rir)
    noise = jnp.asarray(rng.standard_normal((b, t)).astype(np.float32))
    nrirs = np.zeros((b, 3, 1, 64), np.float32)
    nrirs[:, 0, :, 0] = 1.0
    nrirs = jnp.asarray(nrirs)
    start = jnp.zeros((b,), jnp.int32)
    length = jnp.full((b,), t, jnp.int32)
    snr = jnp.zeros((b,), jnp.float32)

    # neither: identity with a channel dim
    out = generate_scene(src, None, None, None, None, None, None, False, False)
    np.testing.assert_allclose(np.asarray(out)[:, 0], np.asarray(src))

    # rir only with delta RIR: identity
    out = generate_scene(src, rir, None, None, None, None, None, True, False)
    np.testing.assert_allclose(np.asarray(out)[:, 0], np.asarray(src), atol=1e-4)

    # noise only: source + scaled noise
    out = generate_scene(src, None, noise, None, start, length, snr, False, True)
    assert not np.allclose(np.asarray(out)[:, 0], np.asarray(src))

    # rir + noise: runs, finite
    out = generate_scene(src, rir, noise, nrirs, start, length, snr, True, True)
    assert np.all(np.isfinite(np.asarray(out)))
    assert out.shape == (b, 1, t)
