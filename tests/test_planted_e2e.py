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
def test_planted_openseg_mode_runs_end_to_end(tmp_path):
    """Open-vocab twin: same planted lesions supervised through the
    imageopenseg step (prompt-aligned voxel embeddings), scored by dice of
    the thresholded prompt-token similarity.  Bound disabled — this pins
    the harness; at tiny size untrained dice sits at the ~0.01 chance
    floor (measured 0.009), so the on-chip bound is only reachable by
    learning."""
    out = str(tmp_path / "planted_openseg")
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    env.update({
        "CONV_CPU": "1",
        "CONV_SIZE": "tiny",
        "CONV_BATCH": "4",
        "CONV_DICE_BOUND": "0.0",
        "CONV_OUT": out,
        "CONV_EVAL_N": "8",
    })
    proc = subprocess.run(
        [sys.executable, SCRIPT, "planted_openseg", "4"],
        env=env, capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    assert "PLANTED OPENSEG LEARNING OK" in proc.stdout
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
    env["CONV_SAVE_EVERY"] = "2"
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
    # periodic checkpoints (CONV_SAVE_EVERY) landed alongside the final save
    ckpts = sorted(os.listdir(os.path.join(out, "checkpoints")))
    assert "ckpt_2" in ckpts and "ckpt_4" in ckpts, ckpts

    # rerun with a larger horizon: the runner must RESUME from ckpt_4, not
    # restart (run-5 attempt 1 died mid-run and lost everything — this pins
    # the auto-resume path end to end)
    proc = subprocess.run(
        [sys.executable, SCRIPT, "planted", "6"],
        env=env, capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    assert "PLANTED LEARNING OK" in proc.stdout
    import json
    steps = [json.loads(line)["step"]
             for line in open(os.path.join(out, "metrics.jsonl"))
             if "\"step\"" in line]
    assert steps.count(1) == 1, steps   # no restart from scratch
    assert 5 in steps and 6 in steps, steps  # continued past the checkpoint
