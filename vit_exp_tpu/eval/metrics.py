"""Evaluation metrics: per-label AUROC + bootstrap CIs.

Parity with scripts/eval.py:
- evaluate_internal (eval.py:160-203): per-label ROC AUC over the 18
  CT-RATE abnormalities → {label}_auc dict (+ mean);
- choose_operating_point (eval.py:104-113): Youden J threshold;
- bootstrap (eval.py:268-333): n resamples with replacement, percentile CIs.

sklearn provides roc_auc_score exactly as the reference uses it; labels with
a single class present are skipped like the reference's try/except
(ct_clip.py:149-156).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

try:
    from sklearn.metrics import roc_auc_score, roc_curve
except ImportError:  # pragma: no cover
    roc_auc_score = None
    roc_curve = None


def evaluate_internal(
    y_pred: np.ndarray, y_true: np.ndarray, labels: Sequence[str]
) -> Dict[str, float]:
    """y_pred/y_true: (N, C).  Returns {label}_auc per label + 'mean_auc'."""
    assert roc_auc_score is not None, "sklearn required for AUROC"
    out: Dict[str, float] = {}
    aucs: List[float] = []
    for i, label in enumerate(labels):
        truth = y_true[:, i]
        if truth.min() == truth.max():  # one class only → undefined AUC
            out[f"{label}_auc"] = float("nan")
            continue
        auc = float(roc_auc_score(truth, y_pred[:, i]))
        out[f"{label}_auc"] = auc
        aucs.append(auc)
    out["mean_auc"] = float(np.mean(aucs)) if aucs else float("nan")
    return out


def choose_operating_point(
    y_true: np.ndarray, y_score: np.ndarray
) -> Tuple[float, float, float]:
    """Youden-J optimal threshold → (threshold, sensitivity, specificity)."""
    fpr, tpr, thresholds = roc_curve(y_true, y_score)
    j = tpr - fpr
    idx = int(np.argmax(j))
    return float(thresholds[idx]), float(tpr[idx]), float(1 - fpr[idx])


def bootstrap_auroc(
    y_pred: np.ndarray,
    y_true: np.ndarray,
    labels: Sequence[str],
    n_samples: int = 1000,
    confidence: float = 0.95,
    seed: int = 0,
) -> Dict[str, Tuple[float, float, float]]:
    """{label: (mean, ci_low, ci_high)} via percentile bootstrap."""
    rng = np.random.default_rng(seed)
    n = y_true.shape[0]
    stats: Dict[str, List[float]] = {label: [] for label in labels}
    for _ in range(n_samples):
        idx = rng.integers(0, n, n)
        yp, yt = y_pred[idx], y_true[idx]
        for i, label in enumerate(labels):
            truth = yt[:, i]
            if truth.min() == truth.max():
                continue
            stats[label].append(float(roc_auc_score(truth, yp[:, i])))
    lo_q = (1 - confidence) / 2
    out = {}
    for label, vals in stats.items():
        if not vals:
            out[label] = (float("nan"),) * 3
            continue
        arr = np.asarray(vals)
        out[label] = (
            float(arr.mean()),
            float(np.quantile(arr, lo_q)),
            float(np.quantile(arr, 1 - lo_q)),
        )
    return out
