#!/usr/bin/env bash
# Checkpoint-sweep zero-shot eval (run_zero_shot_cls_multi_gpu_* equivalent):
# shard the checkpoint list over N launcher invocations of this script with
# SHARD_INDEX / NUM_SHARDS.
set -euo pipefail
CONFIG=$1; RESULTS=$2; shift 2
SHARD_INDEX=${SHARD_INDEX:-0}
NUM_SHARDS=${NUM_SHARDS:-1}
i=0
ARGS=()
for ckpt in "$@"; do
  if [ $((i % NUM_SHARDS)) -eq "$SHARD_INDEX" ]; then
    ARGS+=(--model_path "$ckpt")
  fi
  i=$((i + 1))
done
if [ ${#ARGS[@]} -eq 0 ]; then
  # a shard with no checkpoints must NOT fall through to the CLI's
  # random-init default (and empty "${ARGS[@]}" errors under set -u
  # on bash < 4.4)
  echo "shard $SHARD_INDEX/$NUM_SHARDS: no checkpoints assigned" >&2
  exit 0
fi
exec python -m vit_exp_tpu.cli.run_zero_shot_cls --config "$CONFIG" \
  --results_folder "$RESULTS" "${ARGS[@]}"
