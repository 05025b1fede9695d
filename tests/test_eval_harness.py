"""End-to-end HEAR eval harness: synthetic task dirs → embeddings runner →
memmap consolidation → probe grid search → test.predicted-scores.json.

Mirrors the reference protocol surface (hear-eval-kit heareval) on tiny
fabricated scene and event tasks that a linear probe can solve."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

from wavjepa_tpu.eval.embeddings import runner as embeddings_runner
from wavjepa_tpu.eval.predictions import runner as predictions_runner
from wavjepa_tpu.eval.score import available_scores

SR = 1000  # fake_hear_module.SR


def _write_wav(path: Path, wav: np.ndarray):
    from scipy.io import wavfile

    wavfile.write(path, SR, (wav * 32000).astype(np.int16))


def _tone(freq: float, seconds: float, amp=0.5):
    t = np.arange(int(SR * seconds)) / SR
    return amp * np.sin(2 * np.pi * freq * t)


def _make_scene_task(root: Path, n_per_class=8):
    """3-class single-label classification of tones (trainvaltest)."""
    task = root / "tasks" / "tones"
    freqs = {"low": 30.0, "mid": 120.0, "high": 320.0}
    labels = list(freqs)
    (task / str(SR)).mkdir(parents=True)
    rng = np.random.default_rng(0)
    metadata = {
        "task_name": "tones",
        "embedding_type": "scene",
        "prediction_type": "multiclass",
        "split_mode": "trainvaltest",
        "splits": ["train", "valid", "test"],
        "sample_duration": 1.0,
        "evaluation": ["top1_acc"],
        # keep the test fast but give the probe enough updates
        # (exercises the reference's task_specific_param_grid mechanism,
        # task_predictions.py:1340-1344)
        "evaluation_params": {
            "task_specific_param_grid": {
                "lr": [1e-2],
                "max_epochs": [60],
                "patience": [20],
                "check_val_every_n_epoch": [5],
            }
        },
    }
    (task / "task_metadata.json").write_text(json.dumps(metadata))
    with open(task / "labelvocabulary.csv", "w") as f:
        f.write("idx,label\n")
        for i, lbl in enumerate(labels):
            f.write(f"{i},{lbl}\n")
    for split, n in [("train", n_per_class), ("valid", 4), ("test", 4)]:
        split_dir = task / str(SR) / split
        split_dir.mkdir(parents=True)
        data = {}
        for label in labels:
            for k in range(n):
                name = f"{split}_{label}_{k}.wav"
                wav = _tone(freqs[label], 1.0) + 0.01 * rng.standard_normal(SR)
                _write_wav(split_dir / name, wav)
                data[name] = [label]
        (task / f"{split}.json").write_text(json.dumps(data))
    return task


def _make_event_task(root: Path):
    """1-class sound event detection: a tone burst somewhere in 2 s of
    near-silence (trainvaltest)."""
    task = root / "tasks" / "bursts"
    (task / str(SR)).mkdir(parents=True)
    rng = np.random.default_rng(1)
    metadata = {
        "task_name": "bursts",
        "embedding_type": "event",
        "prediction_type": "multilabel",
        "split_mode": "trainvaltest",
        "splits": ["train", "valid", "test"],
        "sample_duration": 2.0,
        "evaluation": ["event_onset_200ms_fms", "segment_1s_er"],
        "evaluation_params": {
            "task_specific_param_grid": {
                "lr": [1e-2],
                "max_epochs": [30],
                "patience": [10],
                "check_val_every_n_epoch": [5],
            }
        },
    }
    (task / "task_metadata.json").write_text(json.dumps(metadata))
    (task / "labelvocabulary.csv").write_text("idx,label\nbeep,0\n".replace(
        "beep,0", "0,beep"
    ))
    for split, n in [("train", 10), ("valid", 5), ("test", 5)]:
        split_dir = task / str(SR) / split
        split_dir.mkdir(parents=True)
        data = {}
        for k in range(n):
            name = f"{split}_{k}.wav"
            wav = 0.002 * rng.standard_normal(2 * SR)
            start_ms = float(rng.choice([200, 600, 1000, 1400]))
            dur_ms = 400.0
            lo = int(start_ms / 1000 * SR)
            hi = lo + int(dur_ms / 1000 * SR)
            wav[lo:hi] += _tone(120.0, dur_ms / 1000)
            _write_wav(split_dir / name, wav)
            data[name] = [
                {"label": "beep", "start": start_ms, "end": start_ms + dur_ms}
            ]
        (task / f"{split}.json").write_text(json.dumps(data))
    return task


def test_scene_task_end_to_end(tmp_path):
    _make_scene_task(tmp_path)
    emb_dirs = embeddings_runner(
        "fake_hear_module",
        tasks_dir=str(tmp_path / "tasks"),
        embeddings_dir=str(tmp_path / "emb"),
    )
    assert len(emb_dirs) == 1
    emb_dir = emb_dirs[0]
    assert (emb_dir / ".done.embeddings").exists()
    dims = json.loads((emb_dir / "train.embedding-dimensions.json").read_text())
    assert dims == [24, 8]

    results = predictions_runner([str(emb_dir)], grid_points=2, grid="faster")
    scores = json.loads((emb_dir / "test.predicted-scores.json").read_text())
    assert "test" in scores
    # tones are linearly separable in the fake embedding space
    assert scores["test"]["test_top1_acc"] >= 0.75
    # idempotency: second run loads cached results
    again = predictions_runner([str(emb_dir)], grid_points=2, grid="faster")
    assert str(emb_dir) in again


def test_event_task_end_to_end(tmp_path):
    _make_event_task(tmp_path)
    emb_dirs = embeddings_runner(
        "fake_hear_module",
        tasks_dir=str(tmp_path / "tasks"),
        embeddings_dir=str(tmp_path / "emb"),
    )
    emb_dir = emb_dirs[0]
    assert (emb_dir / "train.filename-timestamps.json").exists()
    results = predictions_runner([str(emb_dir)], grid_points=1, grid="faster")
    scores = json.loads((emb_dir / "test.predicted-scores.json").read_text())
    fms = scores["test"]["test_event_onset_200ms_fms_f_measure"]
    er = scores["test"]["test_segment_1s_er_error_rate"]
    assert 0.0 <= fms <= 1.0
    assert er >= 0.0


def test_scores_registry_complete():
    """All reference score names are registered (heareval/score.py:365-404)."""
    for name in [
        "top1_acc", "pitch_acc", "chroma_acc", "event_onset_200ms_fms",
        "event_onset_50ms_fms", "event_onset_offset_50ms_20perc_fms",
        "segment_1s_er", "mAP", "d_prime", "aucroc",
    ]:
        assert name in available_scores


def test_event_score_matching():
    score = available_scores["event_onset_200ms_fms"](label_to_idx={"a": 0})
    targets = {"f1": [{"label": "a", "start": 1000.0, "end": 2000.0}]}
    # within 200 ms collar → perfect
    preds = {"f1": [{"label": "a", "start": 1100.0, "end": 2500.0}]}
    ret = dict(score(preds, targets))
    assert ret["f_measure"] == pytest.approx(1.0)
    # outside collar → zero
    preds = {"f1": [{"label": "a", "start": 1300.0, "end": 2000.0}]}
    ret = dict(score(preds, targets))
    assert ret["f_measure"] == pytest.approx(0.0)


def test_segment_error_rate():
    score = available_scores["segment_1s_er"](label_to_idx={"a": 0})
    targets = {"f1": [{"label": "a", "start": 0.0, "end": 2000.0}]}
    # perfect → ER 0
    assert dict(score(targets, targets))["error_rate"] == pytest.approx(0.0)
    # empty predictions → all deletions → ER 1
    ret = dict(score({"f1": []}, targets))
    assert ret["error_rate"] == pytest.approx(1.0)


# ------------------------------------------------- sed_eval conformance (r3)


def test_event_score_maximum_matching_beats_greedy():
    """sed_eval matches events with MAXIMUM bipartite matching (util.
    bipartite_match), not greedy first-fit. Fixture where sorted greedy
    finds 1 pair but the maximum is 2 (offset condition breaks the interval
    structure): E1 can match R1 or R2, E2 only R1 — optimal assigns E1→R2."""
    score = available_scores["event_onset_offset_50ms_20perc_fms"](
        label_to_idx={"a": 0}
    )
    targets = {
        "f1": [
            {"label": "a", "start": 100.0, "end": 600.0},  # R1 len 0.5s tol 0.1
            {"label": "a", "start": 120.0, "end": 450.0},  # R2 len .33s tol .066
        ]
    }
    preds = {
        "f1": [
            {"label": "a", "start": 90.0, "end": 510.0},  # E1: R1 ✓, R2 ✓
            {"label": "a", "start": 110.0, "end": 650.0},  # E2: R1 ✓, R2 ✗ (offset)
        ]
    }
    ret = dict(score(preds, targets))
    assert ret["f_measure"] == pytest.approx(1.0)
    assert ret["precision"] == pytest.approx(1.0)
    assert ret["recall"] == pytest.approx(1.0)


def test_event_score_iterates_prediction_files_only():
    """heareval evaluates per prediction file (score.py:225-229): reference
    events in files absent from predictions never enter the denominators."""
    score = available_scores["event_onset_200ms_fms"](label_to_idx={"a": 0})
    targets = {
        "f1": [{"label": "a", "start": 0.0, "end": 1000.0}],
        "f2": [{"label": "a", "start": 0.0, "end": 1000.0}],  # unseen file
    }
    preds = {"f1": [{"label": "a", "start": 50.0, "end": 1000.0}]}
    ret = dict(score(preds, targets))
    assert ret["recall"] == pytest.approx(1.0)  # f2's ref not counted


def test_event_score_onset_collar_boundary():
    """sed_eval validate_onset uses ≤: a diff of exactly t_collar matches."""
    score = available_scores["event_onset_200ms_fms"](label_to_idx={"a": 0})
    targets = {"f1": [{"label": "a", "start": 1000.0, "end": 2000.0}]}
    preds = {"f1": [{"label": "a", "start": 1200.0, "end": 2000.0}]}
    assert dict(score(preds, targets))["f_measure"] == pytest.approx(1.0)


def test_segment_grid_extends_to_estimated_events():
    """sed_eval sizes the per-file grid from the max offset over BOTH lists:
    ref ends 1.5s, est spans 3.2–4.0s → 4 segments; hand-computed
    ER = (S0 + D2 + I1) / Nref2 = 1.5."""
    score = available_scores["segment_1s_er"](label_to_idx={"a": 0})
    targets = {"f1": [{"label": "a", "start": 0.0, "end": 1500.0}]}
    preds = {"f1": [{"label": "a", "start": 3200.0, "end": 4000.0}]}
    assert dict(score(preds, targets))["error_rate"] == pytest.approx(1.5)


def test_segment_substitution_counting():
    """Cross-class substitution in one segment: ref 'a', est 'b' in seg 0
    → S=1, D=0, I=0, ER = 1/1 (sed_eval joint per-segment S/D/I)."""
    score = available_scores["segment_1s_er"](label_to_idx={"a": 0, "b": 1})
    targets = {"f1": [{"label": "a", "start": 0.0, "end": 900.0}]}
    preds = {"f1": [{"label": "b", "start": 100.0, "end": 800.0}]}
    assert dict(score(preds, targets))["error_rate"] == pytest.approx(1.0)


def test_sed_scores_empty_inputs_are_zero_not_nan():
    """sed_eval.metric carries eps=np.spacing(1) in denominators: 0/0 → 0."""
    ev = available_scores["event_onset_200ms_fms"](label_to_idx={"a": 0})
    seg = available_scores["segment_1s_er"](label_to_idx={"a": 0})
    assert dict(ev({}, {}))["f_measure"] == 0.0
    assert dict(seg({}, {}))["error_rate"] == 0.0
    # prediction file exists but both lists empty
    assert dict(ev({"f1": []}, {"f1": []}))["f_measure"] == 0.0


def test_event_matching_deep_augmenting_paths_no_recursion_limit():
    """A densely-annotated file whose augmenting paths chain through
    thousands of previously-matched events must not hit Python's recursion
    limit (the matcher is iterative). Staircase graph: ref i overlaps ests
    i-1 and i, so matching ref i flips the entire existing chain."""
    import sys

    from wavjepa_tpu.eval.score import _max_matching

    n = 3000
    adj = [[i - 1, i] if i else [0] for i in range(n)]
    limit = sys.getrecursionlimit()
    sys.setrecursionlimit(200)
    try:
        assert _max_matching(adj, n) == n
    finally:
        sys.setrecursionlimit(limit)
