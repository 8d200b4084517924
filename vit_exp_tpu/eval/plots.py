"""ROC / PR curve plotting (scripts/eval.py:58-158 capability).

matplotlib-based; seaborn styling applied when available.  Each function
saves a PNG per label into plot_dir and returns the figure paths.
"""

from __future__ import annotations

import os
from typing import List, Sequence

import numpy as np


def _style():
    import matplotlib

    matplotlib.use("Agg")
    try:
        import seaborn as sns

        sns.set_theme(style="whitegrid")
    except ImportError:
        pass


def plot_roc(
    y_true: np.ndarray, y_pred: np.ndarray, labels: Sequence[str],
    plot_dir: str,
) -> List[str]:
    from sklearn.metrics import auc, roc_curve

    import matplotlib.pyplot as plt

    _style()
    os.makedirs(plot_dir, exist_ok=True)
    paths = []
    for i, label in enumerate(labels):
        truth = y_true[:, i]
        if truth.min() == truth.max():
            continue
        fpr, tpr, _ = roc_curve(truth, y_pred[:, i])
        fig, ax = plt.subplots(figsize=(5, 5))
        ax.plot(fpr, tpr, label=f"AUC {auc(fpr, tpr):.3f}")
        ax.plot([0, 1], [0, 1], "--", color="gray")
        ax.set_xlabel("False positive rate")
        ax.set_ylabel("True positive rate")
        ax.set_title(label)
        ax.legend()
        path = os.path.join(plot_dir, f"roc_{label.replace(' ', '_')}.png")
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        paths.append(path)
    return paths


def plot_pr(
    y_true: np.ndarray, y_pred: np.ndarray, labels: Sequence[str],
    plot_dir: str,
) -> List[str]:
    from sklearn.metrics import average_precision_score, precision_recall_curve

    import matplotlib.pyplot as plt

    _style()
    os.makedirs(plot_dir, exist_ok=True)
    paths = []
    for i, label in enumerate(labels):
        truth = y_true[:, i]
        if truth.min() == truth.max():
            continue
        prec, rec, _ = precision_recall_curve(truth, y_pred[:, i])
        ap = average_precision_score(truth, y_pred[:, i])
        fig, ax = plt.subplots(figsize=(5, 5))
        ax.plot(rec, prec, label=f"AP {ap:.3f}")
        ax.set_xlabel("Recall")
        ax.set_ylabel("Precision")
        ax.set_title(label)
        ax.legend()
        path = os.path.join(plot_dir, f"pr_{label.replace(' ', '_')}.png")
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        paths.append(path)
    return paths
