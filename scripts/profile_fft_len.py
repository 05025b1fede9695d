"""FFT length choice for the Nat/denoise scene convolution (VERDICT r3 #3).

The scene fftconvolve pads 320000+64000-1 -> next pow2 524288 (1.37x).
XLA TPU FFT also handles smooth composite lengths; measure the real
convolve_with_rir + aggregate_noise pair at candidate padded lengths.
Hoist-proof: chain iterations through a scalar carry.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

B, T, L = 32, 320000, 64000
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, T)), jnp.float32)
rir = jnp.asarray(rng.standard_normal((B, 2, L)), jnp.float32)
nrir = jnp.asarray(rng.standard_normal((B, 3, 2, L)), jnp.float32)
noise = jnp.asarray(rng.standard_normal((B, T)), jnp.float32)

def conv_at(n):
    def fn(c, x, rir, noise, nrir):
        xf = jnp.fft.rfft(x + c, n=n)
        kf = jnp.fft.rfft(rir, n=n)
        wet = jnp.fft.irfft(xf[:, None] * kf, n=n)[..., :T]
        nf = jnp.fft.rfft(noise, n=n)
        skf = jnp.fft.rfft(jnp.sum(nrir, axis=1), n=n)
        bed = jnp.fft.irfft(nf[:, None] * skf, n=n)[..., :T]
        return wet + bed
    return fn

from scripts._timing import timeit

NEED = T + L - 1  # 383999
cands = [
    ("pow2 524288 (shipped)", 524288),
    ("2^10*3*5^3 = 384000", 384000),
    ("3*2^17 = 393216", 393216),
    ("2^12*94? -> 2^7*3000 = 384000 dup", None),
    ("5*2^17 = 655360 (sanity)", None),
    ("2^15*12 = 393216 dup", None),
    ("2^9*750 = 384000 dup", None),
    ("4096*94 = 385024 (2^12*94)", 385024),
    ("2^14*24 = 393216 dup", None),
    ("409600 = 2^14*25", 409600),
    ("2^16*6 = 393216 dup", None),
    ("432000 = 2^7*3^3*5^3", 432000),
    ("2*192000*... 388800=2^6*3^5*5^2", 388800),
]
for name, n in cands:
    if n is None or n < NEED:
        continue
    try:
        timeit(name, conv_at(n), (x, rir, noise, nrir))
    except Exception as e:
        print(f"{name:34s} FAILED: {type(e).__name__}: {str(e)[:120]}", flush=True)
