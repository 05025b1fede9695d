"""Vendored X-ARES task-module protocol (VERDICT r3 #8).

The real harness (`python -m xares.run <encoder.py> src/tasks/<task>.py`,
exactly what /root/reference/run_xares.sh:42 invokes) is not installable in
this image (zero egress). This module captures the task-module INTERFACE —
reconstructed from the public xares source (github.com/jimbozhang/xares,
src/xares/task.py + src/tasks/*_task.py) — as a first-party fixture, so the
encoder contract is validated against the protocol a real task module
drives, not only against the self-authored stub in run.py:

  1. `xares.run` imports the encoder MODULE FILE and discovers the encoder
     class by inspection (an `nn.Module` subclass defined in that module) —
     `discover_encoder_class` mirrors that;
  2. a task module exposes a `config_<name>(encoder) -> TaskConfig` factory;
     `TaskConfig` carries the protocol knobs (splits / folds, crop length,
     probe LR/batch/epochs, `label_processor`, primary `metric`);
  3. the harness validates the encoder (audio_encoder_checker — twinned in
     checker.py), encodes each split at `encoder.sampling_rate` with
     `crop_length_s` cropping, MEAN-POOLS frame embeddings for clip-level
     tasks, trains an MLP probe sized by `output_dim`, and reports the
     configured metric (plus an unsupervised kNN leg, weighted by
     `eval_weight` in the published X-ARES aggregate).

`run_task_protocol` re-enacts 3 end-to-end on fabricated data so the whole
chain — class discovery → config factory → encode → probe → metric — is
exercised in-tree. Field names/defaults are a best-effort reconstruction of
the public source and are PROTOCOL documentation, not an import-compatible
twin; `scripts/run_xares.sh` still defers to the real package when present.
"""

from __future__ import annotations

import dataclasses
import importlib.util
import inspect
from pathlib import Path
from typing import Any, Callable, Optional, Sequence

import numpy as np
import torch


@dataclasses.dataclass
class TaskConfig:
    """Interface reconstruction of ``xares.task.TaskConfig`` (public
    source): the knobs every src/tasks/*_task.py factory sets."""

    encoder: Any
    name: str
    formal_name: str = ""
    metric: str = "accuracy"
    output_dim: Optional[int] = None  # number of classes / labels
    label_processor: Optional[Callable[[dict], Any]] = None
    # data identity + splits
    zenodo_id: str = ""
    train_split: str = "train"
    valid_split: str = "valid"
    test_split: str = "test"
    k_fold_splits: Optional[Sequence[Any]] = None
    use_mini_dataset: bool = False
    # encode / probe protocol
    crop_length_s: Optional[float] = None
    batch_size_encode: int = 16
    batch_size_train: int = 32
    learning_rate: float = 1e-3
    epochs: int = 10
    do_knn: bool = True
    eval_weight: int = 0  # task weight in the published aggregate

    def __post_init__(self):
        if not self.formal_name:
            self.formal_name = self.name


def config_esc50(encoder) -> TaskConfig:
    """Vendored fixture of src/tasks/esc50_task.py's factory: ESC-50 is a
    50-class, 5-fold, 5-second clip-level task."""
    return TaskConfig(
        encoder=encoder,
        name="esc50",
        formal_name="ESC-50",
        metric="accuracy",
        output_dim=50,
        label_processor=lambda sample: sample["label"],
        zenodo_id="zenodo.1234567",  # placeholder: data ids are not protocol
        k_fold_splits=[1, 2, 3, 4, 5],
        crop_length_s=5.0,
        batch_size_train=32,
        learning_rate=1e-3,
        epochs=10,
    )


def discover_encoder_class(encoder_py: str | Path) -> type:
    """Import an encoder module file and find the encoder class the way
    `xares.run` does: the torch.nn.Module subclass DEFINED in that module."""
    encoder_py = Path(encoder_py)
    spec = importlib.util.spec_from_file_location(encoder_py.stem, encoder_py)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    candidates = [
        obj
        for _, obj in inspect.getmembers(module, inspect.isclass)
        if issubclass(obj, torch.nn.Module)
        and obj.__module__ == module.__name__
    ]
    if len(candidates) != 1:
        raise ValueError(
            f"{encoder_py} must define exactly one nn.Module encoder class, "
            f"found {[c.__name__ for c in candidates]}"
        )
    return candidates[0]


def _crop_or_pad(wav: np.ndarray, n: int) -> np.ndarray:
    if wav.shape[-1] >= n:
        return wav[..., :n]
    return np.pad(wav, (0, n - wav.shape[-1]))


def encode_split(config: TaskConfig, samples: Sequence[dict]) -> tuple:
    """Encode a split the way XaresTask.make_encoded_tar drives the encoder:
    batches of (B, crop_samples) float32 at encoder.sampling_rate → frame
    embeddings → clip-level mean pool. Labels via config.label_processor."""
    enc = config.encoder
    sr = enc.sampling_rate
    crop = int(sr * config.crop_length_s) if config.crop_length_s else None
    xs, ys = [], []
    for i in range(0, len(samples), config.batch_size_encode):
        batch = samples[i : i + config.batch_size_encode]
        wavs = [np.asarray(s["audio"], np.float32) for s in batch]
        n = crop if crop else max(w.shape[-1] for w in wavs)
        stacked = np.stack([_crop_or_pad(w, n) for w in wavs])
        with torch.inference_mode():
            emb = enc(torch.from_numpy(stacked))  # (B, T', D)
        assert emb.dim() == 3 and emb.shape[2] == enc.output_dim
        xs.append(emb.mean(dim=1).numpy())
        ys.extend(config.label_processor(s) for s in batch)
    return np.concatenate(xs), np.asarray(ys)


def run_task_protocol(config: TaskConfig, splits: dict) -> dict:
    """Drive the full task protocol on in-memory splits
    ({split_name: [ {audio, label}, ... ]}): encode each split, train the
    MLP probe on train (+valid for early signal), report config.metric on
    test. Returns the result record shaped like the harness's output."""
    from wavjepa_tpu.eval.xares.checker import check_audio_encoder
    from wavjepa_tpu.eval.xares.run import _train_probe

    check_audio_encoder(config.encoder)
    x_tr, y_tr = encode_split(config, splits[config.train_split])
    x_te, y_te = encode_split(config, splits[config.test_split])
    classes = sorted(set(y_tr) | set(y_te))
    cls_to_idx = {c: i for i, c in enumerate(classes)}
    y_tr_i = np.asarray([cls_to_idx[c] for c in y_tr])
    y_te_i = np.asarray([cls_to_idx[c] for c in y_te])
    params, (mu, sd), _ = _train_probe(
        x_tr, y_tr_i, len(classes), lr=config.learning_rate,
        steps=max(50, config.epochs * 30),
    )
    logits = (x_te - mu) / sd @ np.asarray(params[0]) + np.asarray(params[1])
    if config.metric != "accuracy":
        raise NotImplementedError(f"fixture covers accuracy; got {config.metric}")
    value = float((logits.argmax(-1) == y_te_i).mean())
    return {
        "task": config.name,
        "formal_name": config.formal_name,
        "metric": config.metric,
        "value": value,
        "n_train": len(y_tr_i),
        "n_test": len(y_te_i),
    }
