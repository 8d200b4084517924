"""Probe-gated babysitter for long TPU runs under a flapping axon relay.

The failure mode (BENCH_NOTES.md "Relay FLAPPING", round 4): ~10-minute
up-windows alternate with wedge phases where ≥~2 MB host→device transfers
hang FOREVER — no exception is raised, `jax.devices()` still passes, the
training process just stops making progress.  Separately, the axon PJRT
client leaks every host→device transfer ~1:1 in host RSS (BENCH_NOTES.md
"Axon relay HOST-MEMORY LEAK", repro in scripts/repro_axon_leak.py), so
long runs exit 75 via the trainer's RSS watchdog and must be relaunched
to resume from their last checkpoint.

This script keeps a chain of runs alive through both:

- each LAUNCH is gated on an 8 MB device_put probe (a wedged relay fails
  the probe; `jax.devices()` alone does not detect the wedge);
- each running attempt is watched via its metrics.jsonl mtime: no fresh
  metrics within the staleness limit ⇒ the attempt is wedged ⇒ kill -9
  and relaunch (runs auto-resume from their CONV_SAVE_EVERY checkpoints);
- exit codes are classified (classify_exit): 0 = task done, 75
  (EX_TEMPFAIL: RSS watchdog / preemption — state saved) and
  signal-deaths (≥128, incl. 137 OOM-kill) = relaunch, anything else =
  a real failure that retrying cannot fix (e.g. a failed score bound).

The decision logic is pure (classify_exit / staleness / stale_limit /
should_kill) and unit-tested in tests/test_babysit.py; only probe() and
the Popen plumbing need hardware.

Usage (the round-4/5 planted chain):

    python scripts/babysit.py planted:400 planted_seg:300 \
        planted_openseg:300 --log /tmp/babysit.log

or any command with a metrics file to watch:

    python scripts/babysit.py --cmd "python scripts/train_convergence.py \
        planted 400" --metrics results/planted_signal/metrics.jsonl
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# built-in tasks: name -> (argv tail for train_convergence.py, metrics file)
TASKS = {
    "planted": "results/planted_signal/metrics.jsonl",
    "planted_seg": "results/planted_seg/metrics.jsonl",
    "planted_openseg": "results/planted_openseg/metrics.jsonl",
}

# ---------------------------------------------------------------------------
# pure decision logic (unit-tested, no hardware)
# ---------------------------------------------------------------------------


def classify_exit(rc: int) -> str:
    """'done' | 'retry' | 'fail' for a finished attempt.

    0 → done.  75 (EX_TEMPFAIL — the trainer's RSS watchdog / preemption
    handler saved state and asked for a relaunch) and any signal death
    (rc ≥ 128, incl. 137 = SIGKILL from the OOM killer or our own
    staleness kill) → retry: the run auto-resumes from its checkpoint.
    Everything else (assertion failures, tracebacks) → fail: retrying
    re-runs the same deterministic failure.  Accepts both conventions for
    signal deaths: shell-style (128+sig, e.g. 137) and Popen-style
    (negative, e.g. -9)."""
    if rc == 0:
        return "done"
    if rc == 75 or rc >= 128 or rc < 0:
        return "retry"
    return "fail"


def staleness(now: float, t0: float, mtime: float | None) -> float:
    """Seconds since the attempt last showed life: metrics mtime if it has
    written any (and after launch), else launch time."""
    ref = t0 if mtime is None else max(mtime, t0)
    return now - ref


def stale_limit(stepped: bool, grace: float, tight: float) -> float:
    """Before the first metrics write the allowance covers compile + first
    steps (grace); once stepping has started the leash tightens — a healthy
    run writes metrics every step."""
    return tight if stepped else grace


def should_kill(now: float, t0: float, mtime: float | None,
                grace: float, tight: float) -> bool:
    stepped = mtime is not None and mtime > t0
    return staleness(now, t0, mtime) > stale_limit(stepped, grace, tight)


# ---------------------------------------------------------------------------
# hardware-touching plumbing
# ---------------------------------------------------------------------------


def probe(timeout_s: float = 75.0) -> bool:
    """True iff a real 8 MB host→device transfer completes: the flapping
    relay wedges such transfers while jax.devices() keeps passing, so
    only a transfer distinguishes up-window from wedge."""
    code = (
        "import numpy as np, jax, jax.numpy as jnp\n"
        "a = jax.device_put(np.ones((64, 1024, 32), np.float32))\n"
        "assert float(jnp.sum(a)) == 64 * 1024 * 32\n"
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    try:
        return subprocess.run(
            [sys.executable, "-c", code], timeout=timeout_s,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            env=env).returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _mtime(path: str) -> float | None:
    """mtime of the metrics file, or None when it carries no liveness
    signal yet: trainers CREATE an empty metrics.jsonl at init, minutes
    before the first compiled step writes a row — a zero-size file must
    not flip the watchdog to the tight leash (measured: two healthy runs
    killed at ~380 s stale mid-compile, 2026-08-21)."""
    try:
        st = os.stat(path)
    except OSError:
        return None
    return st.st_mtime if st.st_size > 0 else None


def run_task(cmd: list[str], metrics: str, *, log, max_attempts: int = 60,
             grace: float = 600.0, tight: float = 360.0,
             poll_s: float = 45.0, probe_fn=probe, task_log: str | None = None,
             env_extra: dict | None = None) -> int:
    """Launch-watch-relaunch loop for one task.  Returns the task's final
    exit code (0 = done; first non-retryable rc otherwise; 1 if attempts
    ran out)."""
    name = cmd[-2] if len(cmd) >= 2 else cmd[0]
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    env.setdefault("CONV_SAVE_EVERY", "50")
    if env_extra:
        env.update(env_extra)
    out = open(task_log, "ab") if task_log else None
    try:
        for attempt in range(1, max_attempts + 1):
            while probe_fn is not None and not probe_fn():
                log(f"{name} probe down")
                time.sleep(30)
            log(f"{name} attempt {attempt} launch")
            proc = subprocess.Popen(
                cmd, cwd=REPO, env=env, start_new_session=True,
                stdout=out or None, stderr=subprocess.STDOUT if out else None)
            t0 = time.time()
            while True:
                try:
                    rc = proc.wait(timeout=poll_s)
                    break
                except subprocess.TimeoutExpired:
                    pass
                if should_kill(time.time(), t0, _mtime(metrics),
                               grace, tight):
                    st = staleness(time.time(), t0, _mtime(metrics))
                    log(f"{name} attempt {attempt} STALE {st:.0f}s — kill")
                    try:
                        os.killpg(proc.pid, signal.SIGKILL)
                    except OSError:
                        proc.kill()
                    rc = proc.wait()
                    break
            verdict = classify_exit(rc)
            log(f"{name} attempt {attempt} rc={rc} ({verdict})")
            if verdict == "done":
                return 0
            if verdict == "fail":
                return rc
        return 1
    finally:
        if out:
            out.close()


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("tasks", nargs="*",
                   help="built-in tasks as name:steps, e.g. planted:400 "
                        f"(names: {', '.join(TASKS)})")
    p.add_argument("--cmd", help="arbitrary command to babysit (shell string)")
    p.add_argument("--metrics", help="metrics file to watch with --cmd")
    p.add_argument("--log", default="/tmp/babysit.log")
    p.add_argument("--task-log-dir", default="/tmp",
                   help="per-task stdout logs go here")
    p.add_argument("--grace", type=float, default=600.0,
                   help="staleness allowance before the first metrics write")
    p.add_argument("--tight", type=float, default=360.0,
                   help="staleness allowance once stepping has started")
    p.add_argument("--max-attempts", type=int, default=60)
    p.add_argument("--no-probe", action="store_true",
                   help="skip the device_put launch gate (tests)")
    args = p.parse_args(argv)

    logf = open(args.log, "a")

    def log(msg):
        line = f"{time.strftime('%H:%M:%S')} {msg}"
        print(line, flush=True)
        logf.write(line + "\n")
        logf.flush()

    probe_fn = None if args.no_probe else probe
    rcs = []
    if args.cmd:
        if not args.metrics:
            p.error("--cmd requires --metrics")
        rcs.append(run_task(
            args.cmd.split(), args.metrics, log=log,
            max_attempts=args.max_attempts, grace=args.grace,
            tight=args.tight, probe_fn=probe_fn))
    for spec in args.tasks:
        name, _, steps = spec.partition(":")
        if name not in TASKS:
            p.error(f"unknown task {name!r} (known: {', '.join(TASKS)})")
        cmd = [sys.executable, "scripts/train_convergence.py", name,
               steps or "300"]
        rc = run_task(
            cmd, os.path.join(REPO, TASKS[name]), log=log,
            max_attempts=args.max_attempts, grace=args.grace,
            tight=args.tight, probe_fn=probe_fn,
            task_log=os.path.join(args.task_log_dir, f"{name}.log"))
        log(f"{name.upper()} DONE rc={rc}")
        rcs.append(rc)
    log(f"BABYSIT CHAIN DONE rcs={rcs}")
    return max(rcs) if rcs else 0


if __name__ == "__main__":
    sys.exit(main())
