"""RSS guard unit tests (utils/memguard.py — axon transfer-leak guard)."""

import time

from vit_exp_tpu.utils import memguard


def test_rss_bytes_positive():
    assert memguard.rss_bytes() > 0  # Linux CI: /proc always there


def test_limit_disabled_by_zero_frac(monkeypatch):
    monkeypatch.delenv("VIT_EXP_RSS_EXIT_GB", raising=False)
    monkeypatch.setenv("VIT_EXP_RSS_EXIT_FRAC", "0")
    assert memguard.rss_limit_bytes() == 0
    assert memguard.start_rss_guard() is None


def test_absolute_gb_overrides_frac(monkeypatch):
    monkeypatch.setenv("VIT_EXP_RSS_EXIT_GB", "2")
    monkeypatch.setenv("VIT_EXP_RSS_EXIT_FRAC", "0")
    assert memguard.rss_limit_bytes() == 2 * 2**30


def test_guard_fires_once_below_baseline():
    fired = []
    t = memguard.start_rss_guard(
        lambda rss, lim: fired.append((rss, lim)),
        limit_bytes=1024,       # far below any real baseline
        interval_s=0.01,
    )
    assert t is not None
    t.join(timeout=5)
    assert not t.is_alive()     # loop returns after firing once
    assert len(fired) == 1
    rss, lim = fired[0]
    assert rss >= lim == 1024
