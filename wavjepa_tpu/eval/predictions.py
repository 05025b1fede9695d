"""HEAR downstream prediction: shallow-probe training over precomputed
embeddings with random grid search, score-based early stopping, and event
postprocessing search.

First-party re-implementation of the reference protocol
(/root/reference/hear-eval-kit/heareval/predictions/task_predictions.py:52-1469)
— the probe is flax/optax instead of torch/Lightning, but every protocol
decision that materially affects scores is preserved:

  * FullyConnectedPrediction: 0-2 hidden layers (Linear → BatchNorm →
    Dropout → ReLU), xavier init with per-layer gain, sigmoid+BCE for
    multilabel / softmax+CE for multiclass (task_predictions.py:142-194);
  * PARAM_GRID defaults (hidden 1-2×1024, dropout .1, lr grid, patience 20,
    max 500 epochs, val every 3, batch 1024, xavier uniform/normal) with
    fast/faster variants, random-shuffled, first `grid_points` tried
    (task_predictions.py:59-115,1318-1366);
  * early stopping + model selection on the task's primary score
    (val every check_val_every_n_epoch epochs, patience counted in
    validation events, best-epoch weights restored for test);
  * event tasks: per-validation-epoch postprocessing grid search (median
    filter + min duration), best postprocessing frozen at the best epoch and
    reused at test (task_predictions.py:390-536,621-770);
  * LOOCV fold splits, per-fold test, mean/std aggregation,
    test.predicted-scores.json (task_predictions.py:1128-1176,1279-1453).
"""

from __future__ import annotations

import copy
import json
import pickle
import random
import time
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from wavjepa_tpu.eval.score import (
    ScoreFunction,
    available_scores,
    label_to_binary_vector,
    label_vocab_as_dict,
)

TASK_SPECIFIC_PARAM_GRID = {
    "dcase2016_task2": {"check_val_every_n_epoch": [10]},
}

PARAM_GRID = {
    "hidden_layers": [1, 2],
    "hidden_dim": [1024],
    "dropout": [0.1],
    "lr": [3.2e-3, 1e-3, 3.2e-4, 1e-4],
    "patience": [20],
    "max_epochs": [500],
    "check_val_every_n_epoch": [3],
    "batch_size": [1024],
    "initialization": ["xavier_uniform", "xavier_normal"],
}

FAST_PARAM_GRID = copy.deepcopy(PARAM_GRID)
FAST_PARAM_GRID.update({"max_epochs": [10, 50], "check_val_every_n_epoch": [3, 10]})

FASTER_PARAM_GRID = copy.deepcopy(PARAM_GRID)
FASTER_PARAM_GRID.update(
    {
        "hidden_layers": [0, 1],
        "hidden_dim": [64, 128],
        "patience": [1, 3],
        "max_epochs": [10],
        "check_val_every_n_epoch": [1],
    }
)

EVENT_POSTPROCESSING_GRID = {
    "median_filter_ms": [250],
    "min_duration": [125, 250],
}


def parameter_grid(grid: Dict[str, List]) -> List[Dict[str, Any]]:
    """sklearn ParameterGrid equivalent (sorted-key cartesian product)."""
    keys = sorted(grid.keys())
    confs: List[Dict[str, Any]] = [{}]
    for key in keys:
        confs = [dict(c, **{key: v}) for c in confs for v in grid[key]]
    return confs


# ------------------------------------------------------------------ probe model


class FullyConnectedProbe:
    """flax probe matching the reference FullyConnectedPrediction
    (task_predictions.py:142-194)."""

    def __init__(self, nfeatures: int, nlabels: int, prediction_type: str, conf: Dict):
        from flax import linen as nn

        self.prediction_type = prediction_type
        self.conf = conf

        hidden_layers = conf["hidden_layers"]
        hidden_dim = conf["hidden_dim"]
        dropout = conf["dropout"]
        init_name = conf["initialization"]

        def xavier(gain: float):
            import jax

            def init(key, shape, dtype):
                fan_in, fan_out = shape[0], shape[1]
                if init_name == "xavier_uniform":
                    a = gain * np.sqrt(6.0 / (fan_in + fan_out))
                    return jax.random.uniform(key, shape, dtype, -a, a)
                std = gain * np.sqrt(2.0 / (fan_in + fan_out))
                return std * jax.random.normal(key, shape, dtype)

            return init

        relu_gain = float(np.sqrt(2.0))

        class Probe(nn.Module):
            @nn.compact
            def __call__(self, x, train: bool = False):
                gain = 1.0  # "linear" gain for the first layer
                for _ in range(hidden_layers):
                    x = nn.Dense(hidden_dim, kernel_init=xavier(gain))(x)
                    x = nn.BatchNorm(
                        use_running_average=not train, momentum=0.9, epsilon=1e-5
                    )(x)
                    x = nn.Dropout(dropout, deterministic=not train)(x)
                    x = nn.relu(x)
                    gain = relu_gain
                return nn.Dense(nlabels, kernel_init=xavier(gain))(x)

        self.module = Probe()
        self.nfeatures = nfeatures
        self.nlabels = nlabels

    def init(self, seed: int):
        import jax
        import jax.numpy as jnp

        variables = self.module.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, self.nfeatures)), train=False
        )
        return variables["params"], variables.get("batch_stats", {})

    def make_steps(self, lr: float):
        """Returns (train_step, predict_fn) jitted closures."""
        import jax
        import jax.numpy as jnp
        import optax

        tx = optax.adam(lr)
        module = self.module
        multilabel = self.prediction_type == "multilabel"

        def loss_fn(params, batch_stats, x, y, rng):
            out, updates = module.apply(
                {"params": params, "batch_stats": batch_stats},
                x,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            if multilabel:
                loss = jnp.mean(
                    optax.sigmoid_binary_cross_entropy(out, y)
                )
            else:
                loss = jnp.mean(
                    optax.softmax_cross_entropy(out, y)
                )
            return loss, updates["batch_stats"]

        @jax.jit
        def train_step(params, batch_stats, opt_state, x, y, rng):
            (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch_stats, x, y, rng
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, new_stats, opt_state, loss

        @jax.jit
        def predict(params, batch_stats, x):
            logits = module.apply(
                {"params": params, "batch_stats": batch_stats}, x, train=False
            )
            probs = jax.nn.sigmoid(logits) if multilabel else jax.nn.softmax(logits, -1)
            return logits, probs

        return tx, train_step, predict


# ------------------------------------------------------------------ datasets


class SplitData:
    """In-memory view of one or more consolidated splits
    (SplitMemmapDataset, task_predictions.py:539-618)."""

    def __init__(
        self,
        embedding_path: Path,
        split_names: Sequence[str],
        label_to_idx: Dict[str, int],
        nlabels: int,
        embedding_type: str,
    ):
        xs, ys, fnames, ts = [], [], [], []
        for split in split_names:
            dims = json.loads(
                (embedding_path / f"{split}.embedding-dimensions.json").read_text()
            )
            x = np.memmap(
                embedding_path / f"{split}.embeddings.npy",
                dtype=np.float32,
                mode="r",
                shape=tuple(dims),
            )
            with open(embedding_path / f"{split}.target-labels.pkl", "rb") as fp:
                labels = pickle.load(fp)
            y = np.stack(
                [
                    label_to_binary_vector(
                        [label_to_idx[str(lbl)] for lbl in row], nlabels
                    )
                    for row in labels
                ]
            )
            xs.append(np.asarray(x))
            ys.append(y)
            if embedding_type == "event":
                ft = json.loads(
                    (embedding_path / f"{split}.filename-timestamps.json").read_text()
                )
                fnames += [f for f, _ in ft]
                ts += [t for _, t in ft]
        self.x = np.concatenate(xs) if xs else np.zeros((0, 0), np.float32)
        self.y = np.concatenate(ys) if ys else np.zeros((0, 0), np.float32)
        self.filenames = fnames
        self.timestamps = np.asarray(ts, np.float64)

    def __len__(self):
        return len(self.x)


# ------------------------------------------------------------------ events


def median_filter_1d(x: np.ndarray, width: int) -> np.ndarray:
    """Median filter along axis 0 — the exact scipy call the reference
    protocol makes (task_predictions.py:39,506: median_filter(size=(w, 1)),
    default 'reflect' boundary), so event postprocessing scores stay
    comparable. scipy is a hard dependency of the event-task path."""
    from scipy.ndimage import median_filter

    return median_filter(x, size=(width, 1))


def create_events_from_prediction(
    prediction_dict: Dict[float, np.ndarray],
    idx_to_label: Dict[int, str],
    threshold: float = 0.5,
    median_filter_ms: float = 150,
    min_duration: float = 60.0,
) -> List[Dict[str, Any]]:
    """Frame probabilities → event list: threshold, median filter, merge
    adjacent frames, drop events shorter than min_duration ms
    (task_predictions.py:621-689)."""
    timestamps = np.array(sorted(prediction_dict.keys()))
    predictions = np.stack([prediction_dict[t] for t in timestamps])
    ts_diff = np.mean(np.diff(timestamps)) if len(timestamps) > 1 else 1.0
    if median_filter_ms:
        width = int(round(median_filter_ms / ts_diff))
        if width:
            predictions = median_filter_1d(predictions, width)
    binary = predictions > threshold
    events = []
    for label in range(binary.shape[1]):
        active = np.where(binary[:, label])[0]
        if active.size == 0:
            continue
        # split into consecutive runs
        splits = np.where(np.diff(active) > 1)[0] + 1
        for run in np.split(active, splits):
            start, end = timestamps[run[0]], timestamps[run[-1]]
            if end - start >= min_duration:
                events.append(
                    {"label": idx_to_label[label], "start": float(start), "end": float(end)}
                )
    events.sort(key=lambda e: e["start"])
    return events


def get_events_for_all_files(
    predictions: np.ndarray,
    filenames: List[str],
    timestamps: np.ndarray,
    idx_to_label: Dict[int, str],
    postprocessing_grid: Dict[str, List[float]],
    postprocessing: Optional[Tuple[Tuple[str, Any], ...]] = None,
) -> Dict[Tuple[Tuple[str, Any], ...], Dict[str, List[Dict[str, Any]]]]:
    """Group frame predictions by file, then eventize under one or every
    postprocessing configuration (task_predictions.py:692-770)."""
    event_files: Dict[str, Dict[float, np.ndarray]] = {}
    for i, (filename, timestamp) in enumerate(zip(filenames, timestamps)):
        slug = Path(filename).name
        event_files.setdefault(slug, {})[float(timestamp)] = predictions[i]

    confs = (
        [dict(postprocessing)]
        if postprocessing
        else parameter_grid(postprocessing_grid)
    )
    event_dict: Dict[Tuple[Tuple[str, Any], ...], Dict[str, List[Dict[str, Any]]]] = {}
    for conf in confs:
        key = tuple(sorted(conf.items()))
        event_dict[key] = {
            slug: create_events_from_prediction(preds, idx_to_label, **conf)
            for slug, preds in event_files.items()
        }
    return event_dict


# ------------------------------------------------------------------ training


class GridPointResult:
    def __init__(self, conf, validation_score, score_mode, params, batch_stats,
                 epoch, postprocessing, time_in_min):
        self.conf = conf
        self.validation_score = validation_score
        self.score_mode = score_mode
        self.params = params
        self.batch_stats = batch_stats
        self.epoch = epoch
        self.postprocessing = postprocessing
        self.time_in_min = time_in_min

    def __repr__(self):
        return (
            f"GridPointResult(val={self.validation_score:.4f}, "
            f"epoch={self.epoch}, conf={self.conf})"
        )


def _combine_target_events(embedding_path: Path, split_names: List[str]) -> Dict:
    combined: Dict = {}
    for split in split_names:
        combined.update(json.loads((embedding_path / f"{split}.json").read_text()))
    return combined


def _primary_score_value(ret) -> float:
    if isinstance(ret, tuple):
        value = ret[0][1]
    else:
        value = ret
    return 0.0 if np.isnan(value) else float(value)


def _scores_to_dict(name: str, scores: List[ScoreFunction], args) -> Dict[str, float]:
    out: Dict[str, float] = {}
    for score_fn in scores:
        ret = score_fn(*args)
        if isinstance(ret, tuple):
            for sub_name, value in ret:
                out[f"{name}_{score_fn}_{sub_name}"] = value
            out[f"{name}_score"] = ret[0][1]
        else:
            out[f"{name}_{score_fn}"] = float(ret)
    return out


def task_predictions_train(
    embedding_path: Path,
    embedding_size: int,
    metadata: Dict,
    data_splits: Dict[str, List[str]],
    label_to_idx: Dict[str, int],
    nlabels: int,
    scores: List[ScoreFunction],
    conf: Dict,
    use_scoring_for_early_stopping: bool = True,
    seed: int = 42,
) -> GridPointResult:
    """Train one probe configuration with early stopping on the primary
    score; returns the best-epoch weights (task_predictions.py:903-1078)."""
    import jax

    start_time = time.time()
    embedding_type = metadata["embedding_type"]
    idx_to_label = {v: k for k, v in label_to_idx.items()}

    train = SplitData(embedding_path, data_splits["train"], label_to_idx, nlabels, embedding_type)
    valid = SplitData(embedding_path, data_splits["valid"], label_to_idx, nlabels, embedding_type)

    is_event = embedding_type == "event"
    if is_event:
        validation_target_events = _combine_target_events(
            embedding_path, data_splits["valid"]
        )
        postprocessing_grid = metadata.get("evaluation_params", {}).get(
            "event_postprocessing_grid", EVENT_POSTPROCESSING_GRID
        )
    else:
        validation_target_events, postprocessing_grid = None, None

    probe = FullyConnectedProbe(
        embedding_size, nlabels, metadata["prediction_type"], conf
    )
    params, batch_stats = probe.init(seed)
    tx, train_step, predict = probe.make_steps(conf["lr"])
    opt_state = tx.init(params)

    mode = "max" if scores[0].maximize else "min"
    sign = 1.0 if mode == "max" else -1.0
    best = -np.inf
    best_params, best_stats, best_epoch, best_post = params, batch_stats, 0, None
    patience_left = conf["patience"]
    rng = np.random.default_rng(seed)
    import jax.numpy as jnp

    key = jax.random.PRNGKey(seed)

    def evaluate_split(split: SplitData, target_events, name: str):
        """→ (primary_score, best_postprocessing) on a validation-style split."""
        _, probs = predict(params, batch_stats, jnp.asarray(split.x))
        probs = np.asarray(probs)
        if is_event:
            events_by_post = get_events_for_all_files(
                probs, split.filenames, split.timestamps, idx_to_label,
                postprocessing_grid,
            )
            scored = []
            for post, events in events_by_post.items():
                value = _primary_score_value(scores[0](events, target_events))
                scored.append((value, post))
            scored.sort(key=lambda t: sign * t[0], reverse=True)
            return scored[0][0], scored[0][1]
        value = _primary_score_value(scores[0](probs, split.y))
        return value, None

    bs = conf["batch_size"]
    n = len(train)
    epoch = 0
    for epoch in range(1, conf["max_epochs"] + 1):
        perm = rng.permutation(n)
        for i in range(0, n, bs):
            idx = perm[i : i + bs]
            key, sub = jax.random.split(key)
            params, batch_stats, opt_state, _ = train_step(
                params, batch_stats, opt_state,
                jnp.asarray(train.x[idx]), jnp.asarray(train.y[idx]), sub,
            )
        if epoch % conf["check_val_every_n_epoch"] != 0:
            continue
        val_score, val_post = evaluate_split(valid, validation_target_events, "val")
        if best == -np.inf or sign * val_score > sign * best:
            best = val_score
            best_params = jax.tree.map(np.asarray, params)
            best_stats = jax.tree.map(np.asarray, batch_stats)
            best_epoch, best_post = epoch, val_post
            patience_left = conf["patience"]
        else:
            patience_left -= 1
            if patience_left <= 0:
                break

    return GridPointResult(
        conf=conf,
        validation_score=float(best),
        score_mode=mode,
        params=best_params,
        batch_stats=best_stats,
        epoch=best_epoch,
        postprocessing=best_post,
        time_in_min=(time.time() - start_time) / 60,
    )


def task_predictions_test(
    embedding_path: Path,
    grid_point: GridPointResult,
    metadata: Dict,
    data_splits: Dict[str, List[str]],
    label_to_idx: Dict[str, int],
    nlabels: int,
    scores: List[ScoreFunction],
) -> Dict[str, float]:
    """Evaluate best-epoch weights on the test split
    (task_predictions.py:1081-1114)."""
    import jax.numpy as jnp

    embedding_type = metadata["embedding_type"]
    idx_to_label = {v: k for k, v in label_to_idx.items()}
    test = SplitData(
        embedding_path, data_splits["test"], label_to_idx, nlabels, embedding_type
    )
    probe = FullyConnectedProbe(
        test.x.shape[1], nlabels, metadata["prediction_type"], grid_point.conf
    )
    _, _, predict = probe.make_steps(grid_point.conf["lr"])
    _, probs = predict(grid_point.params, grid_point.batch_stats, jnp.asarray(test.x))
    probs = np.asarray(probs)

    if embedding_type == "event":
        target_events = _combine_target_events(embedding_path, data_splits["test"])
        postprocessing_grid = metadata.get("evaluation_params", {}).get(
            "event_postprocessing_grid", EVENT_POSTPROCESSING_GRID
        )
        post = grid_point.postprocessing or tuple(
            sorted(parameter_grid(postprocessing_grid)[0].items())
        )
        events = get_events_for_all_files(
            probs, test.filenames, test.timestamps, idx_to_label,
            postprocessing_grid, post,
        )[tuple(sorted(dict(post).items()))]
        return _scores_to_dict("test", scores, (events, target_events))
    return _scores_to_dict("test", scores, (probs, test.y))


# ------------------------------------------------------------------ driver


def data_splits_from_folds(folds: List[str]) -> List[Dict[str, List[str]]]:
    """LOOCV split construction (task_predictions.py:1128-1163)."""
    sorted_folds = tuple(sorted(folds))
    assert len(sorted_folds) == len(set(sorted_folds))
    num = len(sorted_folds)
    splits = []
    for i in range(num):
        test_fold = sorted_folds[i]
        valid_fold = sorted_folds[(i + 1) % num]
        train_folds = [f for f in sorted_folds if f not in (test_fold, valid_fold)]
        splits.append({"train": train_folds, "valid": [valid_fold], "test": [test_fold]})
    return splits


def get_splits_from_metadata(metadata: Dict) -> List[Dict[str, List[str]]]:
    if metadata["split_mode"] == "trainvaltest":
        return [{"train": ["train"], "valid": ["valid"], "test": ["test"]}]
    if metadata["split_mode"] in ("new_split_kfold", "presplit_kfold"):
        return data_splits_from_folds(metadata["splits"])
    raise AssertionError(f"Unknown split_mode: {metadata['split_mode']}")


def aggregate_test_results(results: Dict[str, Dict[str, float]]) -> Dict[str, float]:
    keys = set()
    for fold in results.values():
        keys |= set(k for k, v in fold.items() if isinstance(v, (int, float)))
    agg = {}
    for key in sorted(keys):
        vals = [fold[key] for fold in results.values() if key in fold]
        agg[f"{key}_mean"] = float(np.mean(vals))
        agg[f"{key}_std"] = float(np.std(vals, ddof=1)) if len(vals) > 1 else 0.0
    return agg


def task_predictions(
    embedding_path: Path,
    embedding_size: Optional[int] = None,
    grid_points: int = 8,
    grid: str = "default",
    seed: int = 42,
) -> Dict:
    """Full per-task prediction protocol (task_predictions.py:1279-1453):
    random grid search on the first split, best conf retrained on remaining
    folds, per-fold test, aggregation, test.predicted-scores.json."""
    import pandas as pd

    embedding_path = Path(embedding_path)
    metadata = json.loads((embedding_path / "task_metadata.json").read_text())
    label_vocab = pd.read_csv(embedding_path / "labelvocabulary.csv")
    nlabels = len(label_vocab)
    label_to_idx = label_vocab_as_dict(label_vocab, key="label", value="idx")
    scores = [
        available_scores[score](label_to_idx=label_to_idx)
        for score in metadata["evaluation"]
    ]
    data_splits = get_splits_from_metadata(metadata)

    if embedding_size is None:
        dims = json.loads(
            (
                embedding_path
                / f"{data_splits[0]['train'][0]}.embedding-dimensions.json"
            ).read_text()
        )
        embedding_size = dims[1]

    final_grid = {
        "default": copy.copy(PARAM_GRID),
        "fast": copy.copy(FAST_PARAM_GRID),
        "faster": copy.copy(FASTER_PARAM_GRID),
    }[grid]
    if metadata["task_name"] in TASK_SPECIFIC_PARAM_GRID:
        final_grid.update(TASK_SPECIFIC_PARAM_GRID[metadata["task_name"]])
    if "task_specific_param_grid" in metadata.get("evaluation_params", {}):
        final_grid.update(metadata["evaluation_params"]["task_specific_param_grid"])

    confs = parameter_grid(final_grid)
    random.Random(seed).shuffle(confs)

    results: List[GridPointResult] = []
    for confi, conf in enumerate(confs[:grid_points]):
        print(f"grid point {confi + 1}/{grid_points}: {conf}", flush=True)
        results.append(
            task_predictions_train(
                embedding_path, embedding_size, metadata, data_splits[0],
                label_to_idx, nlabels, scores, conf, seed=seed,
            )
        )
    sign = 1.0 if results[0].score_mode == "max" else -1.0
    results.sort(key=lambda g: sign * g.validation_score, reverse=True)
    best = results[0]
    print(f"best grid point: {best}", flush=True)

    split_grid_points = [best]
    for split in data_splits[1:]:
        split_grid_points.append(
            task_predictions_train(
                embedding_path, embedding_size, metadata, split,
                label_to_idx, nlabels, scores, best.conf, seed=seed,
            )
        )

    test_results: Dict[str, Any] = {}
    for i, split in enumerate(data_splits):
        fold_str = "|".join(split["test"])
        fold_scores = task_predictions_test(
            embedding_path, split_grid_points[i], metadata, split,
            label_to_idx, nlabels, scores,
        )
        fold_scores.update(
            {
                "validation_score": split_grid_points[i].validation_score,
                "epoch": split_grid_points[i].epoch,
                "time_in_min": split_grid_points[i].time_in_min,
            }
        )
        test_results[fold_str] = fold_scores

    if len(test_results) > 1:
        test_results["aggregated_scores"] = aggregate_test_results(
            {k: v for k, v in test_results.items()}
        )
    test_results.update(
        {
            "hparams": {k: str(v) for k, v in best.conf.items()},
            "postprocessing": [list(kv) for kv in (best.postprocessing or [])],
            "score_mode": best.score_mode,
            "embedding_path": str(embedding_path),
        }
    )
    (embedding_path / "test.predicted-scores.json").write_text(
        json.dumps(test_results, indent=4)
    )
    return test_results


def runner(
    embedding_dirs: List[str],
    grid_points: int = 8,
    grid: str = "default",
) -> Dict[str, Dict]:
    """Predictions CLI body (predictions/runner.py:51-177):
    prediction-done.json idempotency + per-task scoring."""
    all_results = {}
    for emb_dir in embedding_dirs:
        emb_dir = Path(emb_dir)
        done_file = emb_dir / "prediction-done.json"
        if done_file.exists():
            print(f"{emb_dir.name}: predictions already computed", flush=True)
            all_results[str(emb_dir)] = json.loads(
                (emb_dir / "test.predicted-scores.json").read_text()
            )
            continue
        start = time.time()
        result = task_predictions(emb_dir, grid_points=grid_points, grid=grid)
        done_file.write_text(json.dumps({"time_s": time.time() - start}))
        all_results[str(emb_dir)] = result
    return all_results
