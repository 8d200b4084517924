"""Multihost training e2e: a REAL 2-process jax.distributed cluster
(gloo CPU collectives, 4 virtual devices per process) running the
synthetic trainer with per-host data loading.

Proves the pod story end to end, not just the single-process helpers:
- the mesh spans both processes' devices (8 global);
- each host loads only its slice of the global batch (Loader index
  sharding + jax.make_array_from_process_local_data in _device_batch);
- the psum'd global loss is bit-identical on every process;
- the orbax checkpoint save is a working cross-process collective;
- metric logging is main-process-only.

Reference counterpart: `accelerate launch` + NCCL env plumbing
(scripts/README.md:19-27, CTCLIPTrainer.py:346-393).
"""

import json
import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_training(tmp_path):
    runner = os.path.join(os.path.dirname(__file__), "_multihost_runner.py")
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    env["PYTHONPATH"] = (os.path.dirname(os.path.dirname(runner))
                         + os.pathsep + env.get("PYTHONPATH", ""))
    procs = [
        subprocess.Popen(
            [sys.executable, runner, str(pid), "2", str(port),
             str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost runner timed out")
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"runner failed:\n{out[-3000:]}"

    views = []
    for pid in (0, 1):
        with open(tmp_path / f"proc{pid}.json") as f:
            views.append(json.load(f))

    v0, v1 = views
    assert v0["step"] == v1["step"] == 3
    # global (psum'd) losses agree bit-level across processes
    assert v0["losses"].keys() == v1["losses"].keys()
    for k in v0["losses"]:
        assert v0["losses"][k] == pytest.approx(v1["losses"][k], abs=1e-6), k
    assert all(v > 0 for k, v in v0["losses"].items() if k.endswith("loss"))
    # collective checkpoint landed and is visible to both hosts
    assert v0["ckpt_latest"] == v1["ckpt_latest"] == 2
    # main-process-only logging
    assert v0["logger_enabled"] is True
    assert v1["logger_enabled"] is False
    metrics = tmp_path / "results" / "metrics.jsonl"
    assert metrics.exists()
    # eval engine over the cross-host mesh: identical replicated probs
    assert v0["probs_sum"] == pytest.approx(v1["probs_sum"], abs=1e-5)
    assert v0["probs_first"] == pytest.approx(v1["probs_first"], abs=1e-6)
