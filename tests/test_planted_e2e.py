"""End-to-end plumbing of the planted-signal learning demo
(scripts/train_convergence.py planted): full CTClipTrainer over the
planted dataset, then zero-shot scoring + artifacts — at tiny size with
the AUROC bound disabled.  This test pins the HARNESS end to end on CPU
only; the LEARNING claim itself (held-out mean AUROC ≥ 0.8 at mid size)
is a separate on-chip run whose status lives in the BENCH_NOTES
iteration table and results/planted_signal/aurocs.json."""

import os
import subprocess
import sys

import pytest

SCRIPT = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                      "scripts", "train_convergence.py")


@pytest.mark.slow
def test_planted_seg_mode_runs_end_to_end(tmp_path):
    out = str(tmp_path / "planted_seg")
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    env.update({
        "CONV_CPU": "1",
        "CONV_SIZE": "tiny",
        "CONV_BATCH": "4",
        "CONV_DICE_BOUND": "0.0",
        "CONV_OUT": out,
    })
    proc = subprocess.run(
        [sys.executable, SCRIPT, "planted_seg", "4"],
        env=env, capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    assert "PLANTED SEG LEARNING OK" in proc.stdout
    for name in ("dice_scores.npy", "dice_scores.txt"):
        assert os.path.exists(os.path.join(out, name)), name


@pytest.mark.slow
def test_planted_mode_runs_end_to_end(tmp_path):
    out = str(tmp_path / "planted")
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    env.update({
        "CONV_CPU": "1",
        "CONV_SIZE": "tiny",
        "CONV_BATCH": "4",
        "CONV_AUROC_BOUND": "0.0",
        "CONV_OUT": out,
    })
    proc = subprocess.run(
        [sys.executable, SCRIPT, "planted", "4"],
        env=env, capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    assert "PLANTED LEARNING OK" in proc.stdout
    # the standard inference artifacts landed (metrics.save_inference_artifacts)
    for name in ("aurocs.json", "predicted.npz", "labels.npz",
                 "metrics.jsonl"):
        assert os.path.exists(os.path.join(out, name)), name
