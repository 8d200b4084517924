"""Utils tests: logging, profiling, multihost guards."""

import os
import json
import time

from vit_exp_tpu.core.multihost import is_main_process, process_count
from vit_exp_tpu.utils.logging import MetricLogger
from vit_exp_tpu.utils.profiling import StepTimer


def test_metric_logger_jsonl(tmp_path):
    logger = MetricLogger(str(tmp_path), use_wandb=False)
    logger.log({"loss": 1.5, "name": "abc"}, step=3)
    logger.log({"loss": 1.2}, step=4)
    logger.close()
    lines = [json.loads(line) for line in open(tmp_path / "metrics.jsonl")]
    assert lines[0]["step"] == 3 and lines[0]["loss"] == 1.5
    assert lines[0]["name"] == "abc"
    assert lines[1]["loss"] == 1.2


def test_step_timer_skips_compile_steps():
    # wide slow/fast separation: sleep() overshoots freely under load, so
    # assert only the ORDERING invariant (skipped compile steps excluded)
    timer = StepTimer(skip=2, decay=0.5)
    slow, fast = 0.2, 0.01
    for dt in (slow, slow, fast, fast):
        with timer:
            time.sleep(dt)
    m = timer.metrics()
    assert "step_time_ema_s" in m
    assert m["step_time_ema_s"] < slow  # slow 'compile' steps excluded
    assert m["steps_per_sec_ema"] > 1.0 / slow


def test_multihost_single_process():
    assert is_main_process()
    assert process_count() == 1


def test_multihost_cluster_shape_without_coordinator_raises(monkeypatch):
    """--num_processes/--process_id without a coordinator is a
    misconfigured pod launch (N independent trainers all claiming
    process 0), not a single-process run — it must fail loudly."""
    import pytest

    from vit_exp_tpu.core import multihost

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    with pytest.raises(ValueError, match="coordinator"):
        multihost.initialize(num_processes=2)
    with pytest.raises(ValueError, match="coordinator"):
        multihost.initialize(process_id=1)
    assert multihost.initialize() is False  # true single-process no-op


def test_compile_cache_populates_and_respects_env(tmp_path, monkeypatch):
    import jax
    import jax.numpy as jnp

    from vit_exp_tpu.core.compile_cache import enable_compilation_cache

    prev = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    monkeypatch.delenv("VIT_EXP_NO_COMPILE_CACHE", raising=False)
    try:
        d = str(tmp_path / "xla")
        # TPU-only by default: CPU AOT entries are machine-specific and
        # SIGILL-risky across hosts, so the un-forced call declines here
        assert enable_compilation_cache(d) is None
        assert enable_compilation_cache(d, force=True) == d
        float(jax.jit(lambda x: (x * 3).sum())(jnp.ones((256, 256))))
        assert sum(len(f) for _, _, f in os.walk(d)) > 0

        monkeypatch.setenv("VIT_EXP_NO_COMPILE_CACHE", "1")
        assert enable_compilation_cache(force=True) is None
        monkeypatch.delenv("VIT_EXP_NO_COMPILE_CACHE")

        # upstream env var wins and is applied to jax.config (the var is
        # only read by jax itself at import time)
        monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", "/elsewhere")
        assert enable_compilation_cache(force=True) == "/elsewhere"
        assert jax.config.jax_compilation_cache_dir == "/elsewhere"
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          prev_min)
