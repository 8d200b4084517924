"""Persistent XLA executable cache for every CLI entry point.

The flagship programs (13.8k-token CTViT3D encode, the fused train step)
cost 30-120 s each to compile — and on axon-relayed TPUs that compile
happens remotely on every process start.  JAX's persistent compilation
cache keys serialized executables by (HLO, compile options, backend
version) hash, so a serve/eval/train restart with unchanged code reloads
in milliseconds instead.

Called by every CLI main() right after the jax import.  Opt out with
VIT_EXP_NO_COMPILE_CACHE=1 (e.g. when benchmarking compile time itself);
JAX_COMPILATION_CACHE_DIR (the upstream env var) overrides the location
(applied via jax.config so it works even if set after jax imported);
the upstream min-compile-time threshold is then left at its default.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None, *,
                             force: bool = False) -> str | None:
    """Enable the persistent compile cache; returns the dir or None.

    Safe to call multiple times.  Never raises: a read-only filesystem or
    an old jax just leaves caching off.  force=True skips the TPU-only
    gate (for tests, or a pinned single-machine CPU setup).

    The TPU-only gate consults JAX_PLATFORMS / jax_platforms first; only
    when no platform is pinned does it probe `jax.default_backend()`,
    which INITIALIZES the backend (and can block while an axon tunnel is
    down) and pins the platform for the rest of the process — so call
    this AFTER any jax_platforms selection, not before.
    """
    if os.environ.get("VIT_EXP_NO_COMPILE_CACHE"):
        return None
    import jax

    if not force:
        # Prefer the explicit platform request over probing: probing
        # initializes the backend as a side effect.  Only a SINGLE pinned
        # platform is trusted — a priority list like "tpu,cpu" can fall
        # back to CPU at init time, so it must be resolved by probing
        # (writing CPU AOT entries under a "tpu"-first list would revive
        # the cross-VM SIGILL hazard this gate exists to prevent).
        pinned = (getattr(jax.config, "jax_platforms", None)
                  or os.environ.get("JAX_PLATFORMS")
                  or os.environ.get("JAX_PLATFORM_NAME") or "")
        entries = [e.strip().lower() for e in pinned.split(",") if e.strip()]
        if len(entries) == 1:
            backend = entries[0]
        else:
            try:
                backend = jax.default_backend()
            except Exception:  # noqa: BLE001 — no backend (tunnel down)
                return None
        if backend != "tpu":
            # XLA:CPU AOT entries embed the COMPILING machine's feature
            # set; reloading on a host with different features risks
            # SIGILL (observed when a shared ~/.cache moved across dev
            # VMs).  The cache's whole value here is skipping the axon
            # relay's remote TPU compiles, so scope it to TPU.
            return None

    env_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if env_dir:
        # jax only reads the env var at import time; set it explicitly so
        # the cache is live even when the var appeared after jax imported,
        # but respect the user's threshold settings otherwise.
        try:
            jax.config.update("jax_compilation_cache_dir", env_dir)
        except Exception:  # noqa: BLE001 — caching is best-effort
            return None
        return env_dir

    if path is None:
        path = os.path.join(
            os.path.expanduser("~"), ".cache", "vit_exp_tpu", "xla")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache even fast compiles: the relay round-trip dominates, not
        # local XLA time, so the upstream 1 s threshold misses real wins
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:  # noqa: BLE001 — caching is best-effort
        return None
    return path
