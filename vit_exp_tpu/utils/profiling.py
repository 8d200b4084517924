"""Profiling / tracing — first-class, unlike the reference's commented-out
time.time() deltas (SURVEY.md §5: ct_clip.py:1076-1131, data.py:50-108).

- trace(): context manager around jax.profiler.trace → TensorBoard-readable
  traces in the experiment folder;
- StepTimer: per-step wall-time EMA with compile-step exclusion;
- annotate(): named TraceAnnotation for kernel-level attribution.

Axon-relay caveat (measured, see .claude/skills/verify/SKILL.md): wall-time
of repeated identical dispatches can be meaningless — perturb inputs and
force host reads when benchmarking outside the profiler.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """EMA step timer; the first `skip` steps (compiles) are excluded."""

    def __init__(self, skip: int = 2, decay: float = 0.95):
        self.skip = skip
        self.decay = decay
        self.count = 0
        self.ema: Optional[float] = None
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.count += 1
        if self.count > self.skip:
            self.ema = dt if self.ema is None else (
                self.decay * self.ema + (1 - self.decay) * dt
            )
        self.last = dt
        return False

    def metrics(self) -> Dict[str, float]:
        out = {"step_time_s": getattr(self, "last", float("nan"))}
        if self.ema is not None:
            out["step_time_ema_s"] = self.ema
            out["steps_per_sec_ema"] = 1.0 / self.ema
        return out
