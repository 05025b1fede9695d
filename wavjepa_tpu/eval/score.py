"""Downstream-evaluation score library (HEAR 2021 contract).

First-party re-implementation of the reference's score registry
(/root/reference/hear-eval-kit/heareval/score.py:91-404). The classifier
metrics (top1/chroma/mAP/d′/AUCROC) follow the same sklearn calls; the sound
-event-detection metrics re-implement sed_eval's event-based F-measure
(onset collar, optional offset collar + percentage-of-length) and
segment-based error rate with the standard micro-averaged ("overall")
accumulation, since sed_eval/dcase_util are not vendored here.

Event dict format (identical to the reference pipeline):
    {filename: [{"label": str, "start": ms, "end": ms}, ...], ...}
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, List, Optional, Tuple, Union

import numpy as np

Ret = Union[Tuple[Tuple[str, float], ...], float]


def label_vocab_as_dict(df, key: str, value: str) -> Dict:
    """Label-vocabulary DataFrame → {label: idx} or {idx: label}
    (reference score.py:19-32)."""
    if key == "label":
        df["label"] = df["label"].astype(str)
        value = "idx"
    else:
        assert key == "idx", "key argument must be either 'label' or 'idx'"
        value = "label"
    return df.set_index(key).to_dict()[value]


def label_to_binary_vector(label: List[int], num_labels: int) -> np.ndarray:
    """List of integer labels → multi-hot float vector (score.py:35-54)."""
    binary = np.zeros((num_labels,), np.float32)
    if label:
        binary[np.asarray(label, int)] = 1.0
    return binary


def validate_score_return_type(ret: Ret):
    if isinstance(ret, tuple):
        assert all(
            isinstance(s, tuple) and isinstance(s[0], str) and isinstance(s[1], float)
            for s in ret
        )
    elif not isinstance(ret, float):
        raise ValueError(f"unexpected score return type {type(ret)}")


class ScoreFunction:
    """Abstract score functor (reference score.py:91-135)."""

    name: str = ""

    def __init__(
        self,
        label_to_idx: Dict[str, int],
        name: Optional[str] = None,
        maximize: bool = True,
    ):
        self.label_to_idx = label_to_idx
        if name:
            self.name = name
        self.maximize = maximize

    def __call__(self, *args, **kwargs) -> Ret:
        ret = self._compute(*args, **kwargs)
        validate_score_return_type(ret)
        return ret

    def _compute(self, predictions: Any, targets: Any, **kwargs) -> Ret:
        raise NotImplementedError

    def __str__(self):
        return self.name


class Top1Accuracy(ScoreFunction):
    name = "top1_acc"

    def _compute(self, predictions: np.ndarray, targets: np.ndarray, **kwargs) -> float:
        assert predictions.ndim == 2 and targets.ndim == 2
        correct = np.argmax(predictions, 1) == np.argmax(targets, 1)
        return float(np.mean(correct))


class ChromaAccuracy(ScoreFunction):
    """Pitch accuracy ignoring octave errors (score.py:159-180)."""

    name = "chroma_acc"

    def _compute(self, predictions: np.ndarray, targets: np.ndarray, **kwargs) -> float:
        correct = (np.argmax(predictions, 1) % 12) == (np.argmax(targets, 1) % 12)
        return float(np.mean(correct))


class MeanAveragePrecision(ScoreFunction):
    """Macro-averaged AP (score.py:292-318)."""

    name = "mAP"

    def _compute(self, predictions: np.ndarray, targets: np.ndarray, **kwargs) -> float:
        from sklearn.metrics import average_precision_score

        assert predictions.ndim == 2 and targets.ndim == 2
        return float(average_precision_score(targets, predictions, average="macro"))


class DPrime(ScoreFunction):
    """ppf(auc)·√2, macro-averaged (score.py:321-345)."""

    name = "d_prime"

    def _compute(self, predictions: np.ndarray, targets: np.ndarray, **kwargs) -> float:
        from scipy import stats
        from sklearn.metrics import roc_auc_score

        try:
            auc = roc_auc_score(targets, predictions, average=None)
            return float(np.mean(stats.norm().ppf(auc) * np.sqrt(2.0)))
        except ValueError:
            return float("nan")


class AUCROC(ScoreFunction):
    name = "aucroc"

    def _compute(self, predictions: np.ndarray, targets: np.ndarray, **kwargs) -> float:
        from sklearn.metrics import roc_auc_score

        try:
            return float(roc_auc_score(targets, predictions, average="macro"))
        except ValueError:
            return float("nan")


# ----------------------------------------------------------- SED metrics

EventDict = Dict[str, List[Dict[str, Any]]]


def _match_events(
    refs: List[dict],
    ests: List[dict],
    t_collar: float,
    evaluate_offset: bool,
    percentage_of_length: float,
) -> int:
    """Greedy onset(-offset) matching within one (file, label) group; returns
    the number of matched (true-positive) estimated events. Events are in ms;
    t_collar in seconds (sed_eval convention, score.py:365-385)."""
    collar_ms = t_collar * 1000.0
    matched_ref = [False] * len(refs)
    tp = 0
    for est in sorted(ests, key=lambda e: e["start"]):
        for i, ref in enumerate(sorted(refs, key=lambda e: e["start"])):
            if matched_ref[i]:
                continue
            onset_ok = abs(est["start"] - ref["start"]) <= collar_ms
            if not onset_ok:
                continue
            if evaluate_offset:
                # sed_eval: offset condition = within max(t_collar,
                # percentage_of_length · ref duration)
                tol = max(collar_ms, percentage_of_length * (ref["end"] - ref["start"]))
                if abs(est["end"] - ref["end"]) > tol:
                    continue
            matched_ref[i] = True
            tp += 1
            break
    return tp


class EventBasedScore(ScoreFunction):
    """Event-instance F-measure with an onset collar (and optional offset
    condition) — sed_eval EventBasedMetrics "overall" scores, micro-averaged
    over all files and labels (reference score.py:283-292, 365-385)."""

    def __init__(
        self,
        label_to_idx: Dict[str, int],
        scores: Tuple[str, ...] = ("f_measure", "precision", "recall"),
        params: Optional[Dict] = None,
        name: Optional[str] = None,
        maximize: bool = True,
    ):
        super().__init__(label_to_idx=label_to_idx, name=name, maximize=maximize)
        self.scores = scores
        params = params or {}
        self.t_collar = params.get("t_collar", 0.2)
        self.evaluate_offset = params.get("evaluate_offset", False)
        self.percentage_of_length = params.get("percentage_of_length", 0.0)

    def _compute(self, predictions: EventDict, targets: EventDict, **kwargs) -> Ret:
        ntp = nref = nsys = 0
        # union of files: reference events without predictions still count
        # toward nref (sed_eval evaluates every file it is shown)
        for filename in set(predictions) | set(targets):
            ests = predictions.get(filename, [])
            refs = targets.get(filename, [])
            nsys += len(ests)
            nref += len(refs)
            labels = {e["label"] for e in ests} | {e["label"] for e in refs}
            for label in labels:
                ntp += _match_events(
                    [e for e in refs if e["label"] == label],
                    [e for e in ests if e["label"] == label],
                    self.t_collar,
                    self.evaluate_offset,
                    self.percentage_of_length,
                )
        precision = ntp / nsys if nsys else 0.0
        recall = ntp / nref if nref else 0.0
        f = (
            2 * precision * recall / (precision + recall)
            if precision + recall > 0
            else 0.0
        )
        values = {"f_measure": f, "precision": precision, "recall": recall}
        return tuple((s, float(values[s])) for s in self.scores)


class SegmentBasedScore(ScoreFunction):
    """Fixed-grid segment activity metrics — sed_eval SegmentBasedMetrics
    overall error rate: ER = (ΣS + ΣD + ΣI) / ΣNref with per-segment
    S = min(FN, FP), D = FN − S, I = FP − S (reference score.py:270-280)."""

    def __init__(
        self,
        label_to_idx: Dict[str, int],
        scores: Tuple[str, ...] = ("error_rate",),
        params: Optional[Dict] = None,
        name: Optional[str] = None,
        maximize: bool = False,
    ):
        super().__init__(label_to_idx=label_to_idx, name=name, maximize=maximize)
        self.scores = scores
        self.time_resolution = (params or {}).get("time_resolution", 1.0)

    def _activity(self, events: List[dict], n_seg: int, res_ms: float) -> np.ndarray:
        act = np.zeros((n_seg, len(self.label_to_idx)), bool)
        for e in events:
            if e["label"] not in self.label_to_idx:
                continue
            li = self.label_to_idx[e["label"]]
            lo = int(np.floor(e["start"] / res_ms))
            hi = int(np.ceil(e["end"] / res_ms))
            act[max(lo, 0) : min(hi, n_seg), li] = True
        return act

    def _compute(self, predictions: EventDict, targets: EventDict, **kwargs) -> Ret:
        res_ms = self.time_resolution * 1000.0
        tot_s = tot_d = tot_i = tot_ref = tot_tp = tot_fp = tot_fn = 0.0
        for filename in set(predictions) | set(targets):
            ests = predictions.get(filename, [])
            refs = targets.get(filename, [])
            max_ms = max(
                [e["end"] for e in ests + refs] + [0.0]
            )
            n_seg = max(1, int(np.ceil(max_ms / res_ms)))
            est_act = self._activity(ests, n_seg, res_ms)
            ref_act = self._activity(refs, n_seg, res_ms)
            tp = (est_act & ref_act).sum(1).astype(float)
            fp = (est_act & ~ref_act).sum(1).astype(float)
            fn = (~est_act & ref_act).sum(1).astype(float)
            s = np.minimum(fp, fn)
            tot_s += s.sum()
            tot_d += (fn - s).sum()
            tot_i += (fp - s).sum()
            tot_ref += ref_act.sum()
            tot_tp += tp.sum()
            tot_fp += fp.sum()
            tot_fn += fn.sum()
        er = (tot_s + tot_d + tot_i) / tot_ref if tot_ref else 0.0
        precision = tot_tp / (tot_tp + tot_fp) if tot_tp + tot_fp else 0.0
        recall = tot_tp / (tot_tp + tot_fn) if tot_tp + tot_fn else 0.0
        f = (
            2 * precision * recall / (precision + recall)
            if precision + recall > 0
            else 0.0
        )
        values = {
            "error_rate": er,
            "f_measure": f,
            "precision": precision,
            "recall": recall,
        }
        return tuple((s, float(values[s])) for s in self.scores)


available_scores: Dict[str, Callable] = {
    "top1_acc": Top1Accuracy,
    "pitch_acc": partial(Top1Accuracy, name="pitch_acc"),
    "chroma_acc": ChromaAccuracy,
    "event_onset_200ms_fms": partial(
        EventBasedScore,
        name="event_onset_200ms_fms",
        scores=("f_measure", "precision", "recall"),
        params={"evaluate_onset": True, "evaluate_offset": False, "t_collar": 0.2},
    ),
    "event_onset_50ms_fms": partial(
        EventBasedScore,
        name="event_onset_50ms_fms",
        scores=("f_measure", "precision", "recall"),
        params={"evaluate_onset": True, "evaluate_offset": False, "t_collar": 0.05},
    ),
    "event_onset_offset_50ms_20perc_fms": partial(
        EventBasedScore,
        name="event_onset_offset_50ms_20perc_fms",
        scores=("f_measure", "precision", "recall"),
        params={
            "evaluate_onset": True,
            "evaluate_offset": True,
            "t_collar": 0.05,
            "percentage_of_length": 0.2,
        },
    ),
    "segment_1s_er": partial(
        SegmentBasedScore,
        name="segment_1s_er",
        scores=("error_rate",),
        params={"time_resolution": 1.0},
        maximize=False,
    ),
    "mAP": MeanAveragePrecision,
    "d_prime": DPrime,
    "aucroc": AUCROC,
}
