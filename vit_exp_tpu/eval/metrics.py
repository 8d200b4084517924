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


def save_inference_artifacts(results_folder: str, y_pred: np.ndarray,
                             y_true: np.ndarray, accessions, res: Dict
                             ) -> None:
    """Write the reference inference artifact set (zero_shot.py:590-602,
    ct_lipro_inference.py:81-86): `predicted_weights.npz` /
    `labels_weights.npz` under key 'data', `accessions.txt`, plus the AUROC
    table.  The reference writes `aurocs.xlsx` via xlsxwriter; no xlsx
    engine ships offline, so the table goes to `aurocs.csv` (same one-row
    `{label}_auc` layout as the reference DataFrame) and `aurocs.json`.
    Plain `predicted.npz`/`labels.npz` (key arr_0) are kept as well for
    in-repo tooling."""
    import json
    import os

    os.makedirs(results_folder, exist_ok=True)
    np.savez(os.path.join(results_folder, "predicted_weights.npz"),
             data=y_pred)
    np.savez(os.path.join(results_folder, "labels_weights.npz"), data=y_true)
    np.savez(os.path.join(results_folder, "predicted.npz"), y_pred)
    np.savez(os.path.join(results_folder, "labels.npz"), y_true)
    with open(os.path.join(results_folder, "accessions.txt"), "w") as f:
        f.writelines(f"{a}\n" for a in accessions)
    with open(os.path.join(results_folder, "aurocs.json"), "w") as f:
        json.dump(res, f, indent=2)
    # aurocs.csv mirrors the reference's one-row {label}_auc DataFrame —
    # keep timing/throughput side-channel keys out of the table (they stay
    # in aurocs.json, which carries the full res dict)
    keys = [k for k in res if k.endswith("_auc") or k == "mean_auc"]
    with open(os.path.join(results_folder, "aurocs.csv"), "w") as f:
        f.write(",".join(keys) + "\n")
        f.write(",".join(f"{res[k]}" for k in keys) + "\n")


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


def find_threshold(
    probabilities: np.ndarray, true_labels: np.ndarray, n_steps: int = 100
) -> float:
    """Threshold minimizing distance to the ROC ideal point (0, 1) over a
    linspace sweep — bootstrap_values.py:22-52 semantics (their 'best_roc'
    is sqrt((1-TPR)² + FPR²), scanned over 100 thresholds in [0, 1])."""
    best_threshold, best_dist = 0.0, float("inf")
    pos = true_labels == 1
    neg = ~pos
    n_pos, n_neg = int(pos.sum()), int(neg.sum())
    for threshold in np.linspace(0, 1, n_steps):
        pred = probabilities > threshold
        tpr = float((pred & pos).sum()) / n_pos if n_pos else 0.0
        fpr = float((pred & neg).sum()) / n_neg if n_neg else 0.0
        dist = np.sqrt((1 - tpr) ** 2 + fpr ** 2)
        if dist <= best_dist:
            best_dist, best_threshold = dist, float(threshold)
    return best_threshold


def bootstrap_thresholded_metrics(
    y_pred: np.ndarray,
    y_true: np.ndarray,
    labels: Sequence[str],
    n_samples: int = 1000,
    seed: int = 0,
) -> Dict[str, Dict[str, Tuple[float, float, float]]]:
    """Per-label F1 / accuracy / precision (weighted, at the find_threshold
    operating point) over bootstrap resamples → (mean, ci_low, ci_high)
    each — the f1/acc/precision xlsx sweep of bootstrap_values.py:100-160."""
    from sklearn.metrics import (accuracy_score, f1_score, precision_score)

    rng = np.random.default_rng(seed)
    n = y_true.shape[0]
    thresholds = [
        find_threshold(y_pred[:, i], y_true[:, i])
        for i in range(len(labels))
    ]
    stats: Dict[str, Dict[str, List[float]]] = {
        label: {"f1": [], "acc": [], "precision": []} for label in labels
    }
    for _ in range(n_samples):
        idx = rng.integers(0, n, n)
        yp, yt = y_pred[idx], y_true[idx]
        for i, label in enumerate(labels):
            pred = (yp[:, i] > thresholds[i]).astype(int)
            truth = yt[:, i].astype(int)
            stats[label]["f1"].append(
                float(f1_score(truth, pred, average="weighted",
                               zero_division=0)))
            stats[label]["acc"].append(float(accuracy_score(truth, pred)))
            stats[label]["precision"].append(
                float(precision_score(truth, pred, average="weighted",
                                      zero_division=0)))
    out: Dict[str, Dict[str, Tuple[float, float, float]]] = {}
    for label, metric_lists in stats.items():
        out[label] = {}
        for metric, vals in metric_lists.items():
            arr = np.asarray(vals)
            out[label][metric] = (
                float(arr.mean()),
                float(np.quantile(arr, 0.025)),
                float(np.quantile(arr, 0.975)),
            )
    return out


def evaluate_external(
    y_pred: np.ndarray,
    y_true: np.ndarray,
    labels: Sequence[str],
    *,
    skip_idx: Sequence[int] = (4, 13),
    merge_max: Dict[int, Tuple[int, ...]] = None,
) -> Dict[str, float]:
    """External-dataset AUROC with the reference's label remap
    (eval.py:206-265): prediction columns in `skip_idx` are dropped
    (default: 'Coronary artery wall calcification' #4 folded into
    'Arterial wall calcification' #1, 'Mosaic attenuation pattern' #13
    absent externally); `merge_max` maps a kept prediction index to
    the set of internal indices max-pooled into it (default {1: (1, 4)}).
    y_true has one column per KEPT label, in order."""
    if merge_max is None:
        merge_max = {1: (1, 4)}
    out: Dict[str, float] = {}
    aucs: List[float] = []
    counter = 0
    for i, label in enumerate(labels):
        if i in skip_idx:
            continue
        if i in merge_max:
            prob = np.max(y_pred[:, list(merge_max[i])], axis=1)
        else:
            prob = y_pred[:, i]
        truth = y_true[:, counter]
        counter += 1
        if truth.min() == truth.max():
            out[f"{label}_auc"] = float("nan")
            continue
        auc = float(roc_auc_score(truth, prob))
        out[f"{label}_auc"] = auc
        aucs.append(auc)
    out["mean_auc"] = float(np.mean(aucs)) if aucs else float("nan")
    return out
