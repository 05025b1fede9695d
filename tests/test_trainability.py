"""Offline trainability evidence (VERDICT r4 #3b): a few hundred steps of the
composed SSL recipe (masker + EMA-annealed teacher + warmup AdamW, the real
``make_jepa_train_step``) on STRUCTURED synthetic audio must produce
embeddings that beat BOTH chance and a random-init encoder on a linear
probe — the strongest env-available stand-in for the reference's HEAR-score
parity (/root/reference/README.md:151-153).

Task design (calibrated by sweep, PERF.md r5): 8 classes = tone pairs at
quarter-octave spacing (110-370 Hz, below the 800 Hz Nyquist) in 0.4-RMS
noise — hard enough that the random conv+transformer encoder's mean-pooled
features probe at ~0.50, easy enough that 400 SSL steps lift them to ~0.67.
"""

import numpy as np
import jax
import jax.numpy as jnp

from wavjepa_tpu.masking import TimeInverseMaskConfig
from wavjepa_tpu.models.jepa import JEPA, JEPAConfig
from wavjepa_tpu.train.state import TrainState
from wavjepa_tpu.train.step import (
    EMAConfig,
    OptimizerConfig,
    make_jepa_train_step,
    make_optimizer,
)

TINY = JEPAConfig(
    conv_spec=((32, 10, 5), (32, 3, 2)),
    encoder_layers=2,
    encoder_dim=32,
    encoder_heads=4,
    decoder_layers=2,
    decoder_dim=16,
    decoder_heads=4,
    sample_rate=1600,
    process_seconds=0.201,
    average_top_k_layers=2,
)
TINY_MASK = TimeInverseMaskConfig(
    target_masks_per_context=2,
    context_mask_prob=0.5,
    context_mask_length=4,
    target_prob=0.2,
    target_length=4,
    ratio_cutoff=0.1,
)
SR, CLIP, N_CLASSES = 1600, 3200, 8


def make_clips(rng, n_per_class, noise=0.4):
    xs, ys = [], []
    for k in range(N_CLASSES):
        f = 110.0 * (2.0 ** (k * 0.25))  # quarter-octave, max 370 Hz
        for _ in range(n_per_class):
            t = np.arange(CLIP) / SR
            phase = rng.uniform(0, 2 * np.pi, size=2)
            wav = 0.5 * np.sin(2 * np.pi * f * t + phase[0])
            wav += 0.3 * np.sin(2 * np.pi * 1.5 * f * t + phase[1])
            wav += noise * rng.standard_normal(CLIP)
            xs.append(wav.astype(np.float32))
            ys.append(k)
    order = rng.permutation(len(xs))
    return np.stack(xs)[order][:, None, :], np.asarray(ys)[order]


def embed(model, params, clips):
    outs = []
    for i in range(0, len(clips), 16):
        x = jnp.asarray(clips[i : i + 16, :, : TINY.target_length])
        r = model.apply({"params": params}, x, method="represent")
        outs.append(np.asarray(r.mean(axis=1), np.float32))
    return np.concatenate(outs)


def probe_acc(x_tr, y_tr, x_te, y_te):
    from wavjepa_tpu.eval.xares.run import _train_probe

    params, (mu, sd), _ = _train_probe(x_tr, y_tr, N_CLASSES, steps=400, lr=1e-2)
    logits = (x_te - mu) / sd @ np.asarray(params[0]) + np.asarray(params[1])
    return float((logits.argmax(-1) == y_te).mean())


def test_ssl_training_beats_random_encoder_on_probe():
    steps = 400
    rng = np.random.default_rng(0)
    model = JEPA(TINY)
    params0 = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 1, TINY.target_length))
    )["params"]
    tx, sched = make_optimizer(
        OptimizerConfig(lr=1e-3, warmup_steps=20, total_steps=steps)
    )
    state = TrainState.create(jax.tree.map(jnp.copy, params0), tx)
    step = make_jepa_train_step(
        model, tx, sched, nr_samples_per_audio=2, masker_cfg=TINY_MASK,
        ema_cfg=EMAConfig(anneal_end_step=steps // 2), donate=True,
    )
    key = jax.random.PRNGKey(1)
    first_loss = last_loss = None
    for i in range(steps):
        clips, _ = make_clips(rng, 2)  # 16 fresh clips per step
        state, metrics = step(state, jnp.asarray(clips), key)
        if i == 0:
            first_loss = float(metrics["loss"])
    last_loss = float(metrics["loss"])
    assert np.isfinite(last_loss)
    assert last_loss < 0.6 * first_loss, (first_loss, last_loss)

    te_rng = np.random.default_rng(123)
    tr_clips, tr_y = make_clips(te_rng, 12)
    te_clips, te_y = make_clips(te_rng, 6)
    acc_trained = probe_acc(
        embed(model, state.params, tr_clips), tr_y,
        embed(model, state.params, te_clips), te_y,
    )
    acc_random = probe_acc(
        embed(model, params0, tr_clips), tr_y,
        embed(model, params0, te_clips), te_y,
    )
    chance = 1.0 / N_CLASSES
    # measured at these seeds: trained 0.667, random 0.500, chance 0.125
    assert acc_trained > chance + 0.30, (acc_trained, chance)
    assert acc_trained > acc_random + 0.08, (acc_trained, acc_random)
