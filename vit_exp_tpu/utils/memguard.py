"""Host-RSS guard — stdlib-only (importable before jax; CLI --help safe).

Motivation: the axon relay's PJRT client leaks every host→device transfer
~1:1 in host RSS (BENCH_NOTES.md "Axon relay HOST-MEMORY LEAK" has the
3-line repro), so any long-lived process that keeps uploading volumes —
a training loop, a serving process — is eventually SIGKILLed by the
kernel OOM killer, losing in-flight state.  The guard turns that into a
clean, supervisable exit: training saves a checkpoint and returns
"mem_exit" (CTClipTrainer.train), serving exits EX_TEMPFAIL for its
supervisor to restart.  On healthy hosts the ceiling (default 85% of
MemTotal) is simply never reached.

Knobs (shared with the trainer watchdog):
- VIT_EXP_RSS_EXIT_GB    absolute ceiling in GiB (overrides the fraction)
- VIT_EXP_RSS_EXIT_FRAC  fraction of MemTotal (default 0.85; <=0 disables)
Non-Linux hosts (no /proc) disable the guard.
"""

from __future__ import annotations

import os
import threading
from typing import Callable, Optional

EX_TEMPFAIL = 75  # sysexits.h: transient failure — relaunch to resume


def rss_bytes() -> int:
    """Current process VmRSS in bytes (0 when /proc is unavailable)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) * 1024
    except OSError:
        pass
    return 0


def rss_limit_bytes(default_frac: float = 0.85) -> int:
    """Configured RSS ceiling in bytes (0 = guard disabled)."""
    gb = os.environ.get("VIT_EXP_RSS_EXIT_GB")
    if gb is not None:
        return int(float(gb) * 2**30)
    frac = float(os.environ.get("VIT_EXP_RSS_EXIT_FRAC", default_frac))
    if frac <= 0:
        return 0
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal"):
                    return int(frac * int(line.split()[1]) * 1024)
    except OSError:
        pass
    return 0


def start_rss_guard(
    on_trigger: Optional[Callable[[int, int], None]] = None,
    *,
    limit_bytes: Optional[int] = None,
    interval_s: float = 10.0,
) -> Optional[threading.Thread]:
    """Daemon thread that watches RSS and fires `on_trigger(rss, limit)`
    once when the ceiling is crossed.  Default trigger prints a loud line
    and `os._exit(75)` so a supervisor restarts the process (a leaked
    server cannot unwind gracefully — the memory is gone either way, and
    exiting before the OOM killer keeps the exit observable).  Returns
    the thread, or None when the guard is disabled."""
    limit = rss_limit_bytes() if limit_bytes is None else limit_bytes
    if not limit:
        return None

    def _default(rss: int, lim: int) -> None:
        print(
            f"RSS guard: {rss / 2**30:.1f} GiB >= {lim / 2**30:.1f} GiB "
            f"ceiling — exiting {EX_TEMPFAIL} for supervisor restart "
            f"(axon transfer leak, BENCH_NOTES.md)",
            flush=True,
        )
        os._exit(EX_TEMPFAIL)

    fire = on_trigger or _default

    def _loop() -> None:
        import time

        while True:
            rss = rss_bytes()
            if rss >= limit:
                fire(rss, limit)
                return
            time.sleep(interval_s)

    t = threading.Thread(target=_loop, name="rss-guard", daemon=True)
    t.start()
    return t
