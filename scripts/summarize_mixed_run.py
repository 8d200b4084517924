#!/usr/bin/env python
"""Summarize a mixed multi-dataset run's metrics.jsonl into one table.

The planted mixed run (configs/planted_mixed_800.yaml) appends across
babysit relaunches, so a `step` that is <= the previous line's step marks a
restart; this tool segments the file into attempts and reports, for the
LAST attempt: per-dataset loss trajectory (first/last), step-time stats,
and every eval-hook row (zero_shot mean_auc / seg mean_dice) with a
pass/fail against the planted bounds (cls >= 0.8, dice >= 0.5 — the
on-chip singles bounds, BENCH_NOTES "PLANTED TRILOGY").

Usage: python scripts/summarize_mixed_run.py results/planted_mixed_800/metrics.jsonl
"""
import json
import statistics
import sys


def segments(path):
    """Split the jsonl into restart segments (step resets mark relaunches)."""
    segs, cur, prev_step = [], [], None
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            d = json.loads(line)
            step = d.get("step")
            if step is None:
                continue
            is_eval = any(k.startswith("eval/") for k in d)
            if not is_eval and prev_step is not None and step <= prev_step and cur:
                segs.append(cur)
                cur = []
            cur.append(d)
            if not is_eval:
                prev_step = step
    if cur:
        segs.append(cur)
    return segs


def main(path):
    segs = segments(path)
    print(f"{path}: {len(segs)} attempt(s)")
    seg = segs[-1]
    train = [d for d in seg if "step_time_s" in d]
    evals = [d for d in seg if any(k.startswith("eval/") for k in d)]
    if train:
        steps = [d["step"] for d in train]
        times = [d["step_time_s"] for d in train if d["step"] > steps[0]]
        print(f"last attempt: steps {steps[0]}..{steps[-1]} "
              f"({len(train)} logged)")
        if times:
            print(f"step_time_s: median {statistics.median(times):.2f} "
                  f"p90 {sorted(times)[int(0.9 * len(times))]:.2f} "
                  f"max {max(times):.2f}")
        for key in sorted(train[-1]):
            if key.endswith("_loss") and not key.startswith("_"):
                first = next((d[key] for d in train if key in d), None)
                print(f"  {key}: {first:.4f} -> {train[-1][key]:.4f}")
    ok = True
    for d in evals:
        for k, v in d.items():
            if k.endswith("mean_auc"):
                mark = "PASS" if v >= 0.8 else "fail"
                ok &= v >= 0.8
                print(f"  step {d['step']:>4} {k} = {v:.4f}  [{mark} >=0.8]")
            elif k.endswith("mean_dice"):
                # in-training hook; the >=0.5 bound is the singles bound
                print(f"  step {d['step']:>4} {k} = {v:.4f}")
    print("cls bound:", "PASS" if ok and evals else "NO EVAL ROWS" if not evals else "FAIL")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         "results/planted_mixed_800/metrics.jsonl")
