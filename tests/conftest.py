"""Test env: 8 virtual CPU devices so mesh/sharding tests run without TPUs
(the reference's analogue is single-node mp.spawn NCCL simulation,
demo_tests/ddp_clip_loss_torch.py:70-151; SURVEY.md §4.2).

The container's sitecustomize imports jax and registers the axon TPU plugin
before pytest starts, so JAX_PLATFORMS in os.environ is already consumed —
switch platform via jax.config instead (backends are not initialized until
first use, which happens inside the tests)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# CLI mains enable the persistent compile cache; in-process CLI tests must
# not leave home-directory cache writes (min_compile_time 0) enabled for
# the rest of the suite — the cache test deletes this var locally.
os.environ.setdefault("VIT_EXP_NO_COMPILE_CACHE", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
