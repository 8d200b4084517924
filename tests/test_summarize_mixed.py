"""Unit tests for scripts/summarize_mixed_run.py — the attempt-segmenting
logic that makes an APPENDED mixed-run metrics.jsonl (babysit relaunches
write into the same file, utils/logging.py opens it in "a" mode) readable:
a train-step reset (step <= previous step) starts a new segment; eval-hook
rows (duplicate step numbers by design) must NOT split segments."""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

import summarize_mixed_run  # noqa: E402


def _write(tmp_path, rows):
    p = tmp_path / "metrics.jsonl"
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return str(p)


def _train(step, **kw):
    d = {"step": step, "step_time_s": 1.0, "ds0_loss": 0.5}
    d.update(kw)
    return d


def test_single_attempt_is_one_segment(tmp_path):
    p = _write(tmp_path, [_train(1), _train(2), _train(3)])
    segs = summarize_mixed_run.segments(p)
    assert len(segs) == 1
    assert [d["step"] for d in segs[0]] == [1, 2, 3]


def test_step_reset_splits_attempts(tmp_path):
    # attempt 1 reaches 155, relaunch starts over at 1 (our real file)
    p = _write(tmp_path, [_train(154), _train(155), _train(1), _train(2)])
    segs = summarize_mixed_run.segments(p)
    assert len(segs) == 2
    assert [d["step"] for d in segs[0]] == [154, 155]
    assert [d["step"] for d in segs[1]] == [1, 2]


def test_eval_rows_do_not_split(tmp_path):
    # eval hooks log the SAME step as the preceding train row; also the
    # next train row (101) is > the last train step (100) even though an
    # eval row sits between them — neither may start a new segment
    rows = [_train(99), _train(100),
            {"step": 100, "eval/zero_shot_cls_planted/mean_auc": 0.81},
            {"step": 100, "eval/seg_test_planted/mean_dice": 0.06},
            _train(101)]
    p = _write(tmp_path, rows)
    segs = summarize_mixed_run.segments(p)
    assert len(segs) == 1
    assert len(segs[0]) == 5


def test_eval_rows_stay_with_their_attempt(tmp_path):
    rows = [_train(100),
            {"step": 100, "eval/zero_shot_cls_planted/mean_auc": 0.81},
            _train(1),  # relaunch
            _train(2)]
    p = _write(tmp_path, rows)
    segs = summarize_mixed_run.segments(p)
    assert len(segs) == 2
    assert len(segs[0]) == 2 and len(segs[1]) == 2


def test_blank_lines_and_steplesss_rows_ignored(tmp_path):
    p = _write(tmp_path, [_train(1), {"note": "no step key"}, _train(2)])
    with open(p, "a") as f:
        f.write("\n")
    segs = summarize_mixed_run.segments(p)
    assert len(segs) == 1
    assert [d["step"] for d in segs[0]] == [1, 2]


def test_main_prints_bounds(tmp_path, capsys):
    rows = [_train(1), _train(100),
            {"step": 100, "eval/zero_shot_cls_planted/mean_auc": 0.8065},
            {"step": 100, "eval/seg_test_planted/mean_dice": 0.055}]
    p = _write(tmp_path, rows)
    summarize_mixed_run.main(p)
    out = capsys.readouterr().out
    assert "PASS" in out and "0.8065" in out
    assert "cls bound: PASS" in out


def test_main_fail_bound(tmp_path, capsys):
    rows = [_train(1),
            {"step": 200, "eval/zero_shot_cls_planted/mean_auc": 0.74}]
    p = _write(tmp_path, rows)
    summarize_mixed_run.main(p)
    out = capsys.readouterr().out
    assert "cls bound: FAIL" in out
