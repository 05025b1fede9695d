"""ARCH probe models in flax/optax.

Counterpart of /root/reference/ARCH/arch_eval/models/classification_model.py:
10-238, attention_pooling_head.py:7-52 and
sequence_classification_model.py:17-449. Protocol preserved:

  * linear probe / non-linear MLP (Linear → Dropout → ReLU stacks) /
    attention-pooling classifier (learned scalar attention over tokens);
  * AdamW with 10 %-linear-warmup + linear-decay LR over
    max_epochs·steps_per_epoch;
  * model selection by best validation loss;
  * metrics: accuracy + macro-F1 (multiclass) or macro/weighted mAP
    (multilabel).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def _warmup_linear_decay(lr: float, total_steps: int, warmup_pct: float = 0.1):
    import optax

    warmup = max(1, int(total_steps * warmup_pct))
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, lr, warmup),
            optax.linear_schedule(lr, 0.0, max(1, total_steps - warmup)),
        ],
        [warmup],
    )


class ClassificationProbe:
    """ARCH classification probe (linear / non-linear / attention-pooling)."""

    def __init__(
        self,
        layers: Sequence[int] = (),
        input_embedding_size: int = 768,
        dropout: float = 0.1,
        num_classes: int = 2,
        is_multilabel: bool = False,
        mode: str = "linear",
        verbose: bool = False,
        seed: int = 0,
    ):
        from flax import linen as nn

        self.layers = list(layers)
        self.num_classes = num_classes
        self.is_multilabel = is_multilabel
        self.mode = mode
        self.verbose = verbose
        self.seed = seed
        self.input_embedding_size = input_embedding_size

        hidden = self.layers
        drop = dropout
        n_cls = num_classes

        if mode == "attention-pooling":

            class Net(nn.Module):
                @nn.compact
                def __call__(self, x, train: bool = False):
                    # x: (B, T, E) token embeddings
                    scores = nn.Dense(1)(x)[..., 0]  # (B, T)
                    weights = nn.softmax(scores, axis=-1)
                    pooled = (x * weights[..., None]).sum(axis=1)
                    return nn.Dense(n_cls)(pooled)

        else:

            class Net(nn.Module):
                @nn.compact
                def __call__(self, x, train: bool = False):
                    for width in hidden:
                        x = nn.Dense(width)(x)
                        x = nn.Dropout(drop, deterministic=not train)(x)
                        x = nn.relu(x)
                    return nn.Dense(n_cls)(x)

        self.module = Net()
        self.params = None
        self._predict = None

    # ------------------------------------------------------------------ train

    def train(
        self,
        train_data: Tuple[np.ndarray, np.ndarray],
        val_data: Tuple[np.ndarray, np.ndarray],
        learning_rate: float = 1e-3,
        max_num_epochs: int = 100,
        batch_size: int = 32,
        **kwargs,
    ) -> Dict[str, float]:
        """Fit with best-val-loss model selection; returns best val metrics."""
        import jax
        import jax.numpy as jnp
        import optax

        x_train, y_train = train_data
        n = len(x_train)
        steps_per_epoch = max(1, n // batch_size)
        sched = _warmup_linear_decay(learning_rate, max_num_epochs * steps_per_epoch)
        tx = optax.adamw(sched)

        example = jnp.asarray(x_train[:1])
        variables = self.module.init(
            jax.random.PRNGKey(self.seed), example, train=False
        )
        params = variables["params"]
        opt_state = tx.init(params)
        multilabel = self.is_multilabel
        module = self.module

        def loss_fn(params, x, y, rng):
            logits = module.apply(
                {"params": params}, x, train=True, rngs={"dropout": rng}
            )
            if multilabel:
                return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, y))
            return jnp.mean(
                optax.softmax_cross_entropy_with_integer_labels(logits, y)
            )

        @jax.jit
        def train_step(params, opt_state, x, y, rng):
            loss, grads = jax.value_and_grad(loss_fn)(params, x, y, rng)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        @jax.jit
        def predict(params, x):
            logits = module.apply({"params": params}, x, train=False)
            return jax.nn.sigmoid(logits) if multilabel else jax.nn.softmax(logits, -1)

        rng = np.random.default_rng(self.seed)
        key = jax.random.PRNGKey(self.seed + 1)
        best_loss, best_params, best_metrics = np.inf, params, {}
        for epoch in range(max_num_epochs):
            perm = rng.permutation(n)
            for i in range(0, n, batch_size):
                idx = perm[i : i + batch_size]
                key, sub = jax.random.split(key)
                params, opt_state, _ = train_step(
                    params, opt_state, jnp.asarray(x_train[idx]),
                    jnp.asarray(y_train[idx]), sub,
                )
            metrics = self._evaluate_arrays(predict, params, val_data)
            if metrics["loss"] < best_loss:
                best_loss = metrics["loss"]
                best_params = jax.tree.map(np.asarray, params)
                best_metrics = metrics
            if self.verbose:
                print(f"epoch {epoch + 1}: {metrics}", flush=True)
        self.params = best_params
        self._predict = predict
        return best_metrics

    # ----------------------------------------------------------------- metrics

    def _evaluate_arrays(self, predict, params, data) -> Dict[str, float]:
        import jax.numpy as jnp
        import optax

        x, y = data
        probs = np.asarray(predict(params, jnp.asarray(x)))
        if self.is_multilabel:
            from sklearn.metrics import average_precision_score

            eps = 1e-7
            bce = -np.mean(
                y * np.log(probs + eps) + (1 - y) * np.log(1 - probs + eps)
            )
            return {
                "loss": float(bce),
                "map_macro": float(
                    average_precision_score(y, probs, average="macro")
                ),
                "map_weighted": float(
                    average_precision_score(y, probs, average="weighted")
                ),
            }
        from sklearn.metrics import accuracy_score, f1_score

        pred = probs.argmax(axis=1)
        ce = -np.mean(np.log(probs[np.arange(len(y)), y] + 1e-7))
        return {
            "loss": float(ce),
            "accuracy": float(accuracy_score(y, pred)),
            "f1": float(f1_score(y, pred, average="macro")),
        }

    def evaluate(self, data: Tuple[np.ndarray, np.ndarray]) -> Dict[str, float]:
        assert self.params is not None, "train() first"
        return self._evaluate_arrays(self._predict, self.params, data)


class SequenceProbe(ClassificationProbe):
    """Frame-level sequence classification probe
    (sequence_classification_model.py:17-449): per-token linear (or BiLSTM →
    linear) classification; clip arrays are (B, T, E) with (B, T) labels."""

    def __init__(self, *args, use_lstm: bool = False, lstm_dim: int = 256, **kwargs):
        super().__init__(*args, mode="linear", **kwargs)
        from flax import linen as nn

        n_cls = self.num_classes

        if use_lstm:

            class Net(nn.Module):
                @nn.compact
                def __call__(self, x, train: bool = False):
                    import jax.numpy as jnp

                    # x: (B, T, E); bidirectional LSTM over tokens
                    fwd = nn.RNN(nn.LSTMCell(lstm_dim))(x)
                    bwd = nn.RNN(nn.LSTMCell(lstm_dim), reverse=True, keep_order=True)(x)
                    h = jnp.concatenate([fwd, bwd], axis=-1)
                    return nn.Dense(n_cls)(h)

        else:

            class Net(nn.Module):
                @nn.compact
                def __call__(self, x, train: bool = False):
                    return nn.Dense(n_cls)(x)

        self.module = Net()

    def train(self, train_data, val_data, **kwargs):
        """Frame labels are flattened into the loss: (B, T) int labels."""
        return super().train(train_data, val_data, **kwargs)

    def _evaluate_arrays(self, predict, params, data) -> Dict[str, float]:
        import jax.numpy as jnp

        x, y = data
        probs = np.asarray(predict(params, jnp.asarray(x)))  # (B, T, C)
        flat_p = probs.reshape(-1, probs.shape[-1])
        flat_y = np.asarray(y).reshape(-1)
        from sklearn.metrics import accuracy_score, f1_score

        pred = flat_p.argmax(axis=1)
        ce = -np.mean(np.log(flat_p[np.arange(len(flat_y)), flat_y] + 1e-7))
        return {
            "loss": float(ce),
            "accuracy": float(accuracy_score(flat_y, pred)),
            "f1": float(f1_score(flat_y, pred, average="macro")),
        }
