"""Cross-implementation probe equivalence (VERDICT r3 #5).

The repo's HEAR shallow probe is flax/optax while the reference's is
torch/Lightning (/root/reference/hear-eval-kit/heareval/predictions/
task_predictions.py:142-194 FullyConnectedPrediction, 903-1078 train loop).
Every protocol constant is preserved in wavjepa_tpu/eval/predictions.py, but
optimizer/init semantics could still shift the 11 headline HEAR numbers —
this test closes that last untested link by re-enacting the reference probe
minimally in torch (torch 2.x is in the image; Lightning is not needed: the
re-enactment reproduces what Lightning would execute — shuffle, Adam steps,
score-based early stopping with best-epoch weight restore) and asserting the
two implementations reach the same test score on a seeded fabricated task.

The torch twin mirrors the reference defaults exactly:
  * Linear → BatchNorm1d → Dropout → ReLU per hidden layer
    (norm_after_activation=False, hidden_norm=BatchNorm1d — the shipped
    PARAM_GRID values, task_predictions.py:86-94);
  * xavier init with calculate_gain of the PRECEDING activation
    ("linear" for the first layer, "relu" after, task_predictions.py:151-175);
  * Adam(lr) on all parameters (task_predictions.py:327-329);
  * BCEWithLogitsLoss (multilabel) / CrossEntropyLoss over one-hot argmax
    (multiclass) (task_predictions.py:128-141,177-184);
  * per-epoch shuffle, batch_size batches, validation every
    check_val_every_n_epoch epochs, early stop counted in validation events,
    best-validation-score weights restored for test.
"""

import json
import pickle
from pathlib import Path

import numpy as np
import pytest

from wavjepa_tpu.eval.predictions import (
    task_predictions_test,
    task_predictions_train,
)
from wavjepa_tpu.eval.score import available_scores

DIM = 16
NLABELS = 4
CONF = {
    "hidden_layers": 1,
    "hidden_dim": 32,
    "dropout": 0.1,
    "lr": 1e-3,
    "patience": 20,
    "max_epochs": 30,
    "check_val_every_n_epoch": 3,
    "batch_size": 128,
    "initialization": "xavier_uniform",
}


def _write_split(root: Path, split: str, x: np.ndarray, labels):
    (root / f"{split}.embedding-dimensions.json").write_text(json.dumps(list(x.shape)))
    mm = np.memmap(root / f"{split}.embeddings.npy", np.float32, "w+", shape=x.shape)
    mm[:] = x
    mm.flush()
    with open(root / f"{split}.target-labels.pkl", "wb") as fp:
        pickle.dump(labels, fp)


def _fabricate(root: Path, prediction_type: str, seed: int = 0):
    """Seeded fabricated task: class-centered gaussian embeddings, separable
    but noisy enough that the score reflects the training dynamics."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((NLABELS, DIM)) * 1.2
    names = [f"lbl{i}" for i in range(NLABELS)]
    label_to_idx = {n: i for i, n in enumerate(names)}

    def make(n):
        if prediction_type == "multiclass":
            y = rng.integers(0, NLABELS, n)
            x = centers[y] + rng.standard_normal((n, DIM)) * 1.0
            labels = [[names[i]] for i in y]
        else:
            y = (rng.random((n, NLABELS)) < 0.35).astype(np.float32)
            x = y @ centers + rng.standard_normal((n, DIM)) * 0.8
            labels = [[names[i] for i in np.where(row)[0]] for row in y]
        return x.astype(np.float32), labels

    for split, n in (("train", 512), ("valid", 192), ("test", 256)):
        _write_split(root, split, *make(n))
    return label_to_idx


def _flax_score(root: Path, prediction_type: str, score_name: str, label_to_idx):
    metadata = {"embedding_type": "scene", "prediction_type": prediction_type}
    splits = {"train": ["train"], "valid": ["valid"], "test": ["test"]}
    scores = [available_scores[score_name](label_to_idx)]
    grid_point = task_predictions_train(
        root, DIM, metadata, splits, label_to_idx, NLABELS, scores, dict(CONF),
        seed=42,
    )
    result = task_predictions_test(
        root, grid_point, metadata, splits, label_to_idx, NLABELS, scores
    )
    return result[f"test_{score_name}"]


def _torch_score(root: Path, prediction_type: str, score_name: str, label_to_idx):
    """Minimal torch re-enactment of the reference probe + protocol."""
    import torch

    torch.manual_seed(42)

    def load(split):
        dims = json.loads((root / f"{split}.embedding-dimensions.json").read_text())
        x = np.array(
            np.memmap(root / f"{split}.embeddings.npy", np.float32, "r", shape=tuple(dims))
        )
        with open(root / f"{split}.target-labels.pkl", "rb") as fp:
            rows = pickle.load(fp)
        y = np.zeros((len(rows), NLABELS), np.float32)
        for i, row in enumerate(rows):
            for lbl in row:
                y[i, label_to_idx[lbl]] = 1.0
        return torch.from_numpy(x), torch.from_numpy(y)

    xtr, ytr = load("train")
    xva, yva = load("valid")
    xte, yte = load("test")

    # FullyConnectedPrediction (task_predictions.py:142-194), shipped grid
    # defaults: BatchNorm1d before activation, xavier_uniform_, gains by
    # preceding activation
    layers = []
    gain = torch.nn.init.calculate_gain("linear")
    lin = torch.nn.Linear(DIM, CONF["hidden_dim"])
    torch.nn.init.xavier_uniform_(lin.weight, gain=gain)
    layers += [
        lin,
        torch.nn.BatchNorm1d(CONF["hidden_dim"]),
        torch.nn.Dropout(CONF["dropout"]),
        torch.nn.ReLU(),
    ]
    proj = torch.nn.Linear(CONF["hidden_dim"], NLABELS)
    torch.nn.init.xavier_uniform_(proj.weight, gain=torch.nn.init.calculate_gain("relu"))
    layers.append(proj)
    model = torch.nn.Sequential(*layers)

    if prediction_type == "multilabel":
        loss_fn = torch.nn.BCEWithLogitsLoss()
    else:
        ce = torch.nn.CrossEntropyLoss()

        def loss_fn(logits, y):  # OneHotToCrossEntropyLoss, :128-141
            return ce(logits, y.argmax(1))

    opt = torch.optim.Adam(model.parameters(), lr=CONF["lr"])
    score_fn = available_scores[score_name](label_to_idx)

    def validate(x, y):
        model.eval()
        with torch.no_grad():
            logits = model(x)
            probs = (
                torch.sigmoid(logits)
                if prediction_type == "multilabel"
                else torch.softmax(logits, -1)
            )
        return float(score_fn(probs.numpy(), y.numpy()))

    rng = np.random.default_rng(42)
    best, best_state, patience_left = -np.inf, None, CONF["patience"]
    n, bs = len(xtr), CONF["batch_size"]
    for epoch in range(1, CONF["max_epochs"] + 1):
        model.train()
        perm = rng.permutation(n)
        for i in range(0, n, bs):
            idx = perm[i : i + bs]
            opt.zero_grad()
            loss = loss_fn(model(xtr[idx]), ytr[idx])
            loss.backward()
            opt.step()
        if epoch % CONF["check_val_every_n_epoch"]:
            continue
        val = validate(xva, yva)
        if val > best:
            best = val
            best_state = {k: v.clone() for k, v in model.state_dict().items()}
            patience_left = CONF["patience"]
        else:
            patience_left -= 1
            if patience_left <= 0:
                break
    model.load_state_dict(best_state)
    return validate(xte, yte)


@pytest.mark.parametrize(
    "prediction_type,score_name",
    [("multiclass", "top1_acc"), ("multilabel", "mAP")],
)
def test_probe_matches_torch_reenactment(tmp_path, prediction_type, score_name):
    label_to_idx = _fabricate(tmp_path, prediction_type, seed=0)
    flax_score = _flax_score(tmp_path, prediction_type, score_name, label_to_idx)
    torch_score = _torch_score(tmp_path, prediction_type, score_name, label_to_idx)
    # Different frameworks, different RNG streams — equivalence means the
    # protocols converge to the same score on the same task, not bit
    # equality. The fabricated task's Bayes gap keeps this discriminative:
    # a probe missing BatchNorm, the xavier gains, or early-stop restore
    # lands well outside 0.06 on this task.
    assert abs(flax_score - torch_score) < 0.06, (
        f"{prediction_type}/{score_name}: flax {flax_score:.4f} "
        f"vs torch {torch_score:.4f}"
    )
    assert flax_score > 0.6 and torch_score > 0.6
