"""Multi-label report-classifier trainer (text_classifier/model_trainer.py).

Capability parity: BCEWithLogits multi-label loop (model_trainer.py:99-148),
best-val-loss checkpointing + early stop (27-97), scheduler choice between
cosine-annealing-warm-restarts and reduce-on-plateau (train.py:17-153), and
the per-label P/R/F1 evaluation of eval.py:9-69.
"""

from __future__ import annotations

import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vit_exp_tpu.models.losses import bce_with_logits
from vit_exp_tpu.text_classifier.classifier import RadBertClassifier


def cosine_annealing_warm_restarts(
    base_lr: float, first_cycle: int, mult: int = 1, warmup: int = 0,
    min_lr: float = 0.0, gamma: float = 1.0,
):
    """CAWR schedule (text_classifier/cosine_annealing_warmup.py:5-87)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)

        def cycle_info(s):
            # closed form for mult == 1; iterative for mult > 1 is rare
            if mult == 1:
                cycle = jnp.floor(s / first_cycle)
                s_in = s - cycle * first_cycle
                return cycle, s_in, jnp.asarray(first_cycle, jnp.float32)
            # geometric cycles
            cycle = jnp.floor(
                jnp.log1p((mult - 1) * s / first_cycle) / jnp.log(mult)
            )
            start = first_cycle * (mult ** cycle - 1) / (mult - 1)
            length = first_cycle * mult ** cycle
            return cycle, s - start, length

        cycle, s_in, length = cycle_info(step)
        peak = base_lr * gamma ** cycle
        warm = min_lr + (peak - min_lr) * s_in / jnp.maximum(warmup, 1)
        cos = min_lr + 0.5 * (peak - min_lr) * (
            1 + jnp.cos(jnp.pi * (s_in - warmup) / jnp.maximum(length - warmup, 1))
        )
        return jnp.where(s_in < warmup, warm, cos)

    return schedule


class ReduceLROnPlateau:
    """Host-side RLOP multiplier (torch semantics: factor on stall;
    min_lr is an ABSOLUTE floor on the effective LR, so the scale floors
    at min_lr / base_lr — not at min_lr itself, which would let the
    effective LR decay 1000x below the intended minimum)."""

    def __init__(self, factor: float = 0.5, patience: int = 5,
                 min_lr: float = 1e-8, base_lr: float = 1.0):
        self.factor = factor
        self.patience = patience
        self.min_scale = min_lr / max(base_lr, 1e-30)
        self.best = float("inf")
        self.bad_epochs = 0
        self.scale = 1.0

    def step(self, metric: float) -> float:
        if metric < self.best - 1e-12:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.scale = max(self.scale * self.factor, self.min_scale)
                self.bad_epochs = 0
        return self.scale


class TextClassifierTrainer:
    def __init__(
        self,
        model: RadBertClassifier,
        *,
        lr: float = 2e-5,
        scheduler: str = "cawr",  # "cawr" | "rlop"
        first_cycle: int = 1000,
        results_folder: str = "./results_text_classifier",
        early_stop: int = 100,
        seed: int = 0,
    ):
        self.model = model
        self.results_folder = results_folder
        os.makedirs(results_folder, exist_ok=True)
        rng = jax.random.PRNGKey(seed)
        dummy = jnp.zeros((1, 8), jnp.int32)
        self.params = model.init(rng, dummy, jnp.ones((1, 8), jnp.int32))[
            "params"
        ]
        self.scheduler_kind = scheduler
        self.rlop = ReduceLROnPlateau(base_lr=lr)
        self._lr_scale = 1.0
        if scheduler == "cawr":
            sched = cosine_annealing_warm_restarts(lr, first_cycle, warmup=50)
            self.tx = optax.adamw(sched)
        else:
            self._base_lr = lr
            self.tx = optax.inject_hyperparams(optax.adamw)(learning_rate=lr)
        self.opt_state = self.tx.init(self.params)
        self.best_loss = float("inf")
        self.best_params = None
        self.epochs_no_improve = 0
        self.early_stop = early_stop
        self.step = 0

        mdl = model

        @jax.jit
        def train_step(params, opt_state, ids, mask, labels):
            def loss_fn(p):
                logits = mdl.apply({"params": p}, ids, mask)
                return jnp.mean(
                    bce_with_logits(logits, labels.astype(jnp.float32))
                )

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        @jax.jit
        def eval_step(params, ids, mask, labels):
            logits = mdl.apply({"params": params}, ids, mask)
            loss = jnp.mean(bce_with_logits(logits, labels.astype(jnp.float32)))
            return loss, jax.nn.sigmoid(logits)

        self._train_step = train_step
        self._eval_step = eval_step

    def fit_batch(self, ids, mask, labels) -> float:
        if self.scheduler_kind == "rlop":
            self.opt_state.hyperparams["learning_rate"] = (
                self._base_lr * self._lr_scale
            )
        self.params, self.opt_state, loss = self._train_step(
            self.params, self.opt_state, jnp.asarray(ids), jnp.asarray(mask),
            jnp.asarray(labels),
        )
        self.step += 1
        return float(loss)

    def evaluate(self, batches) -> Dict[str, float]:
        losses, probs, labels = [], [], []
        for ids, mask, y in batches:
            loss, p = self._eval_step(self.params, jnp.asarray(ids),
                                      jnp.asarray(mask), jnp.asarray(y))
            losses.append(float(loss))
            probs.append(np.asarray(p))
            labels.append(np.asarray(y))
        probs = np.concatenate(probs)
        labels = np.concatenate(labels)
        preds = (probs > 0.5).astype(np.float32)
        eps = 1e-9
        tp = (preds * labels).sum(0)
        fp = (preds * (1 - labels)).sum(0)
        fn = ((1 - preds) * labels).sum(0)
        precision = tp / (tp + fp + eps)
        recall = tp / (tp + fn + eps)
        f1 = 2 * precision * recall / (precision + recall + eps)
        val_loss = float(np.mean(losses))
        if self.scheduler_kind == "rlop":
            self._lr_scale = self.rlop.step(val_loss)
        return {
            "val_loss": val_loss,
            "accuracy": float((preds == labels).mean()),
            "macro_f1": float(f1.mean()),
            "macro_precision": float(precision.mean()),
            "macro_recall": float(recall.mean()),
        }

    def end_epoch(self, val_loss: float, *, autosave: bool = True) -> bool:
        """Track best loss; returns True when early stop triggers.
        On improvement the CURRENT params are snapshotted as best (and
        written to disk when autosave) — the reference checkpoints the
        best-val-loss model every time it improves (model_trainer.py
        best-loss checkpoint + patience 100)."""
        if val_loss < self.best_loss:
            self.best_loss = val_loss
            self.best_params = self.params
            self.epochs_no_improve = 0
            if autosave:
                self.save()
            return False
        self.epochs_no_improve += 1
        return self.epochs_no_improve >= self.early_stop

    def save(self, path: str = None) -> str:
        """Serialize the best (or current) params as flax msgpack."""
        from flax import serialization

        path = path or os.path.join(self.results_folder,
                                    "best_model.msgpack")
        params = self.best_params if self.best_params is not None \
            else self.params
        with open(path + ".tmp", "wb") as f:
            f.write(serialization.to_bytes(params))
        os.replace(path + ".tmp", path)
        return path

    def load(self, path: str):
        """Restore params saved by save() (shape-checked against init)."""
        from flax import serialization

        with open(path, "rb") as f:
            self.params = serialization.from_bytes(self.params, f.read())
        return self.params


def per_label_report(
    y_pred: np.ndarray,
    y_true: np.ndarray,
    label_names,
    out_csv: str = None,
    threshold: float = 0.5,
):
    """Per-label precision/recall/F1/support from binarized predictions —
    text_classifier/eval.py:29-63 (manual confusion-matrix metrics + CSV).
    Returns {label: {precision, recall, f1, support}}."""
    preds = (np.asarray(y_pred) > threshold).astype(np.int32)
    truth = np.asarray(y_true).astype(np.int32)
    report = {}
    rows = []
    for i, name in enumerate(label_names):
        tp = int(((preds[:, i] == 1) & (truth[:, i] == 1)).sum())
        fp = int(((preds[:, i] == 1) & (truth[:, i] == 0)).sum())
        fn = int(((preds[:, i] == 0) & (truth[:, i] == 1)).sum())
        precision = tp / (tp + fp) if tp + fp else 0.0
        recall = tp / (tp + fn) if tp + fn else 0.0
        f1 = (2 * precision * recall / (precision + recall)
              if precision + recall else 0.0)
        report[name] = {"precision": precision, "recall": recall,
                        "f1": f1, "support": tp + fn}
        rows.append((name, precision, recall, f1, tp + fn))
    if out_csv:
        with open(out_csv, "w") as f:
            f.write("label,precision,recall,f1,support\n")
            for name, p, r, f1v, s in rows:
                f.write(f"{name},{p:.6f},{r:.6f},{f1v:.6f},{s}\n")
    return report
