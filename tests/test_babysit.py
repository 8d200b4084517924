"""Unit tests for the babysitter's decision logic (scripts/babysit.py) —
the staleness/exit-code rules that keep long TPU runs alive under the
flapping relay (VERDICT r4 #2: survival tooling must live in the repo
with unit coverage for what doesn't need hardware)."""

import os
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

import babysit  # noqa: E402


class TestClassifyExit:
    @pytest.mark.parametrize("rc,verdict", [
        (0, "done"),
        (75, "retry"),    # EX_TEMPFAIL: RSS watchdog / preemption saved state
        (137, "retry"),   # SIGKILL: OOM killer or our own staleness kill
        (129, "retry"),   # any signal death
        (-9, "retry"),    # Popen convention for SIGKILL
        (143, "retry"),   # SIGTERM
        (1, "fail"),      # assertion (e.g. a failed score bound) — retrying
        (2, "fail"),      # re-runs the same deterministic failure
        (74, "fail"),
    ])
    def test_table(self, rc, verdict):
        assert babysit.classify_exit(rc) == verdict


class TestStaleness:
    def test_no_metrics_yet_counts_from_launch(self):
        assert babysit.staleness(now=100.0, t0=40.0, mtime=None) == 60.0

    def test_metrics_older_than_launch_ignored(self):
        # a resumed run watches a metrics file the PREVIOUS attempt wrote
        assert babysit.staleness(now=100.0, t0=40.0, mtime=10.0) == 60.0

    def test_fresh_metrics_reset_the_clock(self):
        assert babysit.staleness(now=100.0, t0=40.0, mtime=90.0) == 10.0

    def test_grace_before_first_step(self):
        # compile + first steps allowance while nothing has been written
        assert not babysit.should_kill(
            now=500.0, t0=0.0, mtime=None, grace=600.0, tight=360.0)
        assert babysit.should_kill(
            now=601.0, t0=0.0, mtime=None, grace=600.0, tight=360.0)

    def test_tight_leash_once_stepping(self):
        # metrics written after launch ⇒ stepping started ⇒ tight limit
        assert babysit.should_kill(
            now=500.0, t0=0.0, mtime=100.0, grace=600.0, tight=360.0)
        assert not babysit.should_kill(
            now=400.0, t0=0.0, mtime=100.0, grace=600.0, tight=360.0)

    def test_stale_metrics_from_prior_attempt_use_grace(self):
        # mtime predates this attempt's launch: not evidence of stepping
        assert not babysit.should_kill(
            now=500.0, t0=10.0, mtime=5.0, grace=600.0, tight=360.0)


class TestRunTask:
    """Integration on fake subprocesses — no TPU, sub-second timings."""

    def _log(self):
        lines = []
        return lines, lambda m: lines.append(m)

    def test_retry_then_done(self, tmp_path):
        """rc=75 (mem_exit) relaunches; rc=0 ends the task."""
        metrics = tmp_path / "metrics.jsonl"
        flag = tmp_path / "second_attempt"
        script = tmp_path / "task.py"
        script.write_text(
            "import os, sys\n"
            f"open({str(metrics)!r}, 'a').write('x\\n')\n"
            f"if os.path.exists({str(flag)!r}): sys.exit(0)\n"
            f"open({str(flag)!r}, 'w').write('1')\n"
            "sys.exit(75)\n")
        lines, log = self._log()
        rc = babysit.run_task(
            [sys.executable, str(script)], str(metrics), log=log,
            probe_fn=None, poll_s=0.05, grace=5.0, tight=5.0)
        assert rc == 0
        assert any("rc=75 (retry)" in l for l in lines)
        assert any("rc=0 (done)" in l for l in lines)

    def test_hard_failure_stops(self, tmp_path):
        """A deterministic failure (rc=1) is NOT retried."""
        script = tmp_path / "task.py"
        script.write_text("import sys; sys.exit(1)\n")
        lines, log = self._log()
        # generous staleness windows: on a loaded 1-core CI host python
        # startup can exceed a small grace and turn rc=1 into a kill+retry
        rc = babysit.run_task(
            [sys.executable, str(script)], str(tmp_path / "m.jsonl"),
            log=log, probe_fn=None, poll_s=0.05, grace=60.0, tight=60.0)
        assert rc == 1
        assert sum("launch" in l for l in lines) == 1

    def test_wedged_attempt_killed_and_retried(self, tmp_path):
        """A run that writes one metrics row then hangs is staleness-killed
        (SIGKILL ⇒ retry); the relaunch completes."""
        metrics = tmp_path / "metrics.jsonl"
        flag = tmp_path / "second_attempt"
        script = tmp_path / "task.py"
        script.write_text(
            "import os, sys, time\n"
            f"open({str(metrics)!r}, 'a').write('x\\n')\n"
            f"if os.path.exists({str(flag)!r}): sys.exit(0)\n"
            f"open({str(flag)!r}, 'w').write('1')\n"
            "time.sleep(60)\n")
        lines, log = self._log()
        t0 = time.time()
        rc = babysit.run_task(
            [sys.executable, str(script)], str(metrics), log=log,
            probe_fn=None, poll_s=0.1, grace=10.0, tight=0.5)
        assert rc == 0
        assert time.time() - t0 < 20
        assert any("STALE" in l for l in lines)

    def test_probe_gates_launch(self, tmp_path):
        """Launch waits for the probe; a down-then-up probe still launches."""
        calls = []
        # down once, then up forever (a loaded CI host may retry attempts)
        probe_fn = lambda: calls.append(1) or len(calls) > 1  # noqa: E731
        script = tmp_path / "task.py"
        script.write_text("import sys; sys.exit(0)\n")
        lines, log = self._log()
        orig_sleep = time.sleep
        import unittest.mock as mock
        with mock.patch.object(babysit.time, "sleep",
                               lambda s: orig_sleep(min(s, 0.01))):
            rc = babysit.run_task(
                [sys.executable, str(script)], str(tmp_path / "m"),
                log=log, probe_fn=probe_fn, poll_s=0.05,
                grace=30.0, tight=30.0)
        assert rc == 0
        assert any("probe down" in l for l in lines)


def test_empty_metrics_file_is_not_a_liveness_signal(tmp_path):
    """Trainers create an EMPTY metrics.jsonl at init minutes before the
    first compiled step writes a row — _mtime must return None for it so
    the grace (not tight) leash applies during initial compile."""
    m = tmp_path / "metrics.jsonl"
    assert babysit._mtime(str(m)) is None          # missing
    m.write_text("")
    assert babysit._mtime(str(m)) is None          # created but empty
    m.write_text('{"step": 1}\n')
    assert babysit._mtime(str(m)) is not None      # first real row


def test_cli_smoke(tmp_path):
    """End-to-end through main(): --cmd + --metrics + --no-probe."""
    script = tmp_path / "ok.py"
    script.write_text("import sys; sys.exit(0)\n")
    rc = babysit.main([
        "--cmd", f"{sys.executable} {script}",
        "--metrics", str(tmp_path / "m.jsonl"),
        "--log", str(tmp_path / "log.txt"),
        "--no-probe",
    ])
    assert rc == 0
    assert "rc=0 (done)" in (tmp_path / "log.txt").read_text()


def test_cli_rejects_unknown_task(tmp_path, capsys):
    with pytest.raises(SystemExit):
        babysit.main(["nosuchtask:100", "--log", str(tmp_path / "l")])
