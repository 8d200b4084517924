#!/usr/bin/env bash
# From-scratch training launcher (run_train_from_sratch.sh equivalent).
# Single process drives the whole mesh; multi-host via JAX_COORDINATOR_ADDRESS
# (core/multihost.py) instead of accelerate/NCCL env plumbing.
set -euo pipefail
CONFIG=${1:-configs/ct_clip_vit_from_scratch.yaml}
shift || true
exec python -m vit_exp_tpu.cli.run_train --config "$CONFIG" --auto_resume "$@"
