#!/usr/bin/env bash
# One-shot TPU-return verification (CLAUDE.md "Round-2 continuation"
# checklist): run everything in order the moment the tunnel is back,
# logging to results/tpu_return/.  Each step is individually time-bounded
# so a relapse of the outage can't wedge the run.
#
#   bash scripts/tpu_return_checklist.sh
#
# Steps:
#   0. probe          jax.devices() must answer within 120 s
#   1. entry          __graft_entry__.py (verify surface 1)
#   2. bench          bench.py — expect ~25.3 vol/s/chip (int8 default)
#   3. bench bf16     BENCH_ATTN_IMPL=pallas_static (FF follows) ~20.5
#   4. bench train    bench.py --train — expect ~1.53-1.56 steps/s
#   5. convergence    scripts/train_convergence.py — CONVERGENCE OK
#   6. serving        bench_serve --clients 8 vs --max_batch 1
#   7. compile cache  second bench.py run; if the persistent cache works
#                     through the relay its compile phase collapses
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=results/tpu_return
mkdir -p "$OUT"
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$OUT/checklist.log"; }
run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  log "=== $name: $*"
  if timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1; then
    log "$name OK: $(tail -1 "$OUT/$name.log")"
  else
    log "$name FAILED (rc=$?, see $OUT/$name.log): $(tail -1 "$OUT/$name.log")"
  fi
}

log "probing TPU..."
if ! timeout 120 python -c "import jax; d=jax.devices(); \
    assert d[0].platform=='tpu', d"; then
  log "TPU still unavailable — aborting"
  exit 1
fi
log "TPU is BACK"

run entry       900  python __graft_entry__.py
run bench_int8  1800 python bench.py
run bench_bf16  1800 env BENCH_ATTN_IMPL=pallas_static python bench.py
run bench_train 1800 python bench.py --train
run convergence 900  env PYTHONPATH=/root/repo:/root/.axon_site \
                     python scripts/train_convergence.py
# int8 serving-default accuracy gate at production shape (prob delta +
# rank stability vs bf16 on identical on-device volumes)
run int8_gate   3000 python scripts/int8_accuracy_gate.py --volumes 200
run serve_mb4   2400 env PYTHONPATH=/root/repo:/root/.axon_site \
                     python scripts/bench_serve.py --clients 8
run serve_mb1   2400 env PYTHONPATH=/root/repo:/root/.axon_site \
                     python scripts/bench_serve.py --clients 8 --max_batch 1
# compile-cache validation: a SECOND bench run should skip the 30-120 s
# remote compiles if executable serialization works through the relay
run bench_cached 1800 env JAX_COMPILATION_CACHE_DIR="$HOME/.cache/vit_exp_tpu/xla" \
                      python bench.py

# LONG stages, opt-in via CHECKLIST_LONG=1 (hours on slow hosts):
if [ "${CHECKLIST_LONG:-0}" = "1" ]; then
  # full-trainer sustained integration (VERDICT r2 #1; proven 2026-08-19
  # — BENCH_NOTES "Sustained production run_train"): flagship arch via
  # the real packed loader, eval + async-save hooks, then kill/resume
  if [ ! -d /tmp/synth_packed ]; then
    run make_shards 1800 python scripts/make_synth_shards.py \
                         --out /tmp/synth_packed --n 12
  fi
  run prod_sustained 14400 python -m vit_exp_tpu.cli.run_train \
      --config configs/prod_sustained_synth.yaml --synthetic_eval 4
  # planted-signal LEARNING demo (VERDICT r2 #6): mid-size arch through
  # the full trainer reaches mean zero-shot AUROC >= 0.8 on held-out data
  run planted 14400 env PYTHONPATH=/root/repo:/root/.axon_site \
      python scripts/train_convergence.py planted
  # planted lesion-blob SEG demo: closed-set seg head learns to localize
  # blobs at uniform random positions — held-out mean dice >= 0.5 (chance ~0)
  run planted_seg 14400 env PYTHONPATH=/root/repo:/root/.axon_site \
      python scripts/train_convergence.py planted_seg
fi

log "checklist complete — logs in $OUT/"
