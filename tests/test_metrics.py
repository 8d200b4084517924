"""Metrics + retrieval utilities tests."""

import numpy as np

from vit_exp_tpu.eval.latents import (
    report_to_volume,
    volume_to_volume,
)
from vit_exp_tpu.eval.metrics import (
    bootstrap_auroc,
    choose_operating_point,
    evaluate_internal,
)


def _preds(n=60, c=3, signal=0.8, seed=0):
    rng = np.random.default_rng(seed)
    y = (rng.random((n, c)) > 0.5).astype(np.float32)
    p = np.clip(signal * y + rng.random((n, c)) * (1 - signal / 2), 0, 1)
    return p, y


def test_evaluate_internal_auc_range():
    p, y = _preds()
    res = evaluate_internal(p, y, ["a", "b", "c"])
    assert set(res) == {"a_auc", "b_auc", "c_auc", "mean_auc"}
    assert all(0.7 < res[f"{label}_auc"] <= 1.0 for label in "abc")
    # degenerate single-class label → nan, excluded from mean
    y2 = y.copy()
    y2[:, 0] = 1.0
    res2 = evaluate_internal(p, y2, ["a", "b", "c"])
    assert np.isnan(res2["a_auc"])
    assert np.isfinite(res2["mean_auc"])


def test_choose_operating_point_youden():
    p, y = _preds(c=1)
    thr, sens, spec = choose_operating_point(y[:, 0], p[:, 0])
    assert 0 <= thr <= 1.01
    assert 0 <= sens <= 1 and 0 <= spec <= 1
    assert sens + spec > 1.0  # better than chance on signal data


def test_bootstrap_auroc_cis():
    p, y = _preds(n=80)
    cis = bootstrap_auroc(p, y, ["a", "b", "c"], n_samples=50, seed=1)
    for label in "abc":
        mean, lo, hi = cis[label]
        assert lo <= mean <= hi
        assert hi - lo < 0.5


def test_retrieval_self_consistency():
    rng = np.random.default_rng(2)
    lat = rng.standard_normal((12, 16)).astype(np.float32)
    # paired text = noisy copy of image latents → recall@1 should be high
    text = lat + 0.05 * rng.standard_normal((12, 16)).astype(np.float32)
    r2v = report_to_volume(text, lat, k=1)
    assert r2v["recall_at_k"] >= 0.9
    v2v = volume_to_volume(lat, k=3)
    assert v2v["indices"].shape == (12, 3)
    # self is excluded from EVERY neighbor slot
    assert not any(i == row_i for row_i, row in enumerate(v2v["indices"])
                   for i in row)
    labels = (rng.random((12, 4)) > 0.5).astype(np.float32)
    v2v2 = volume_to_volume(lat, k=3, labels=labels)
    assert "label_overlap" in v2v2
    assert v2v2["label_overlap"].shape == (12, 3)


def test_find_threshold_separable():
    from vit_exp_tpu.eval.metrics import find_threshold

    rng = np.random.default_rng(0)
    labels = np.concatenate([np.zeros(50), np.ones(50)])
    probs = np.concatenate([rng.uniform(0, 0.3, 50), rng.uniform(0.7, 1, 50)])
    t = find_threshold(probs, labels)
    assert 0.3 <= t <= 0.7  # any separating threshold is ROC-ideal


def test_bootstrap_thresholded_metrics():
    from vit_exp_tpu.eval.metrics import bootstrap_thresholded_metrics

    rng = np.random.default_rng(1)
    y_true = rng.integers(0, 2, (60, 2))
    y_pred = np.clip(y_true + rng.normal(0, 0.3, (60, 2)), 0, 1)
    out = bootstrap_thresholded_metrics(y_pred, y_true, ["a", "b"],
                                        n_samples=20)
    for lbl in ("a", "b"):
        for metric in ("f1", "acc", "precision"):
            mean, lo, hi = out[lbl][metric]
            assert 0 <= lo <= mean <= hi <= 1


def test_evaluate_external_remap():
    from vit_exp_tpu.eval.metrics import evaluate_external

    rng = np.random.default_rng(2)
    labels = [f"L{i}" for i in range(15)]
    y_pred = rng.uniform(0, 1, (40, 15))
    # external truth has 13 columns (15 minus skipped idx 4 and 13)
    y_true = rng.integers(0, 2, (40, 13))
    out = evaluate_external(y_pred, y_true, labels)
    assert "L4_auc" not in out and "L13_auc" not in out
    assert len([k for k in out
                if k.endswith("_auc") and k != "mean_auc"]) == 13

    # the merged column must use max(pred[:,1], pred[:,4])
    from sklearn.metrics import roc_auc_score

    expected = roc_auc_score(y_true[:, 1],
                             np.maximum(y_pred[:, 1], y_pred[:, 4]))
    np.testing.assert_allclose(out["L1_auc"], expected)
