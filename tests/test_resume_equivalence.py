"""Resume equivalence (VERDICT r3 #6): training N steps straight must equal
training k steps, checkpointing, restoring, and training N−k more — on
params, EMA teacher, optimizer moments, AND the LR-schedule position.

The reference cannot do this at all (its SSL path wires no ckpt_path,
/root/reference/train.py; only denoise.py:213 resumes) — this repo claims
resume as a fixed gap, so it is proven end-to-end through train_jepa itself:
  * per-step RNG is fold_in(key, state.step) — a pure function of the
    restored counter (train/step.py);
  * the synthetic stream is keyed per batch index and repositioned from the
    restored step (data/synthetic.py, train/loop.py build_data_iterator);
  * orbax round-trips the full TrainState (params/teacher/opt/step).
"""

import dataclasses

import jax
import numpy as np
import pytest

from wavjepa_tpu.train.config import Config
from wavjepa_tpu.train.loop import train_jepa


def _tiny_cfg(save_dir: str, steps: int, ckpt_every: int) -> Config:
    cfg = Config()
    cfg.data = dataclasses.replace(
        cfg.data,
        synthetic=True,
        sr=1600,
        process_seconds=0.201,
        target_seconds=2.0,
        samples_per_audio=2,
    )
    cfg.extractor = dataclasses.replace(
        cfg.extractor, conv_spec=[[16, 10, 5], [16, 3, 2]]
    )
    cfg.masker = dataclasses.replace(
        cfg.masker,
        target_masks_per_context=2,
        context_mask_prob=0.5,
        context_mask_length=4,
        target_prob=0.2,
        target_length=4,
    )
    cfg.optimizer = dataclasses.replace(
        cfg.optimizer, lr=1e-3, warmup_steps=2, total_steps=10
    )
    cfg.ema = dataclasses.replace(cfg.ema, anneal_end_step=8)
    cfg.trainer = dataclasses.replace(
        cfg.trainer,
        size="tiny",
        num_devices=1,  # conftest exposes 8 virtual devices; batch 2 is not
        # divisible by 8 and DP-vs-single equality is covered elsewhere
        batch_size=2,
        average_top_k_layers=2,
        steps=steps,
        ckpt_every=ckpt_every,
        log_every=100,
        save_dir=save_dir,
    )
    return cfg


def _leaves(tree):
    return jax.tree_util.tree_flatten_with_path(jax.tree.map(np.asarray, tree))


def test_resume_equals_straight_run(tmp_path):
    n, k = 6, 3

    # straight run: N steps, no mid checkpoints
    straight = train_jepa(_tiny_cfg(str(tmp_path / "straight"), n, ckpt_every=100))

    # resumed run: k steps (checkpoint at k), then restore + (N−k)
    resumed_dir = str(tmp_path / "resumed")
    mid = train_jepa(_tiny_cfg(resumed_dir, k, ckpt_every=100))
    assert int(mid.step) == k
    resumed = train_jepa(_tiny_cfg(resumed_dir, n, ckpt_every=100))

    assert int(straight.step) == n and int(resumed.step) == n
    for name, tree_a, tree_b in (
        ("params", straight.params, resumed.params),
        ("teacher", straight.teacher_encoder, resumed.teacher_encoder),
        ("opt_state", straight.opt_state, resumed.opt_state),
    ):
        flat_a, struct_a = _leaves(tree_a)
        flat_b, struct_b = _leaves(tree_b)
        assert struct_a == struct_b, f"{name} tree structure differs"
        for (path, a), (_, b) in zip(flat_a, flat_b):
            if not np.issubdtype(np.asarray(a).dtype, np.floating):
                np.testing.assert_array_equal(a, b)
                continue
            np.testing.assert_allclose(
                a, b, rtol=1e-6, atol=1e-7,
                err_msg=f"{name} diverges at {jax.tree_util.keystr(path)}",
            )

    # the straight run's params must have actually moved (the test would be
    # vacuous if the first k steps were no-ops)
    fresh = train_jepa(_tiny_cfg(str(tmp_path / "one"), 1, ckpt_every=100))
    moved = any(
        not np.allclose(a, b)
        for (_, a), (_, b) in zip(_leaves(straight.params)[0], _leaves(fresh.params)[0])
    )
    assert moved


def test_synthetic_stream_repositions_exactly():
    from wavjepa_tpu.data.synthetic import synthetic_audio_batches

    it = synthetic_audio_batches(2, seconds=0.5, sr=1600, seed=3)
    full = [next(it) for _ in range(5)]
    it2 = synthetic_audio_batches(2, seconds=0.5, sr=1600, seed=3, start_batch=3)
    np.testing.assert_array_equal(full[3], next(it2))
    np.testing.assert_array_equal(full[4], next(it2))
