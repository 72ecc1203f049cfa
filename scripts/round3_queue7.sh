#!/bin/bash
# Round-3 queue, phase 7: post-reset rebuild. The machine hosting phases 1-6
# was wiped (datasets/, results/, /tmp lost; only committed artifacts
# survived), so this phase re-lands everything chip-dependent that was lost:
#   1. training-throughput rows B=2/8/16 (VERDICT #7) - no dataset needed,
#      runs while scripts/gen_datasets.py regenerates the four datasets;
#   2. the sparse density-crossover bench (VERDICT #5);
#   3. the four never-recorded canonical workloads (VERDICT #1), each
#      gated on its dataset npz appearing with a stable size.
# Crash lessons from phases 5-6 (CLAUDE.md): Random_QP/SVM/QP_1500 train on
# the --no_epoch_scan route (per-batch dispatch over the device preload).
# Usage: nohup bash scripts/round3_queue7.sh > /tmp/round3_q7.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
echo $$ > /tmp/round3_q7.shell.pid

step() {
  local name="$1" tmo="$2"; shift 2
  echo "[q7] ==== $name start $(date) ===="
  timeout "$tmo" "$@" > "/tmp/q7_${name}.log" 2>&1
  echo "[q7] ==== $name exit=$? end $(date) ===="
}

# wait for a dataset npz to exist with a stable size (generator done)
wait_ds() {
  local ds="$1" max_min="${2:-150}" waited=0 s1 s2
  while [ ! -f "$ds" ] && [ "$waited" -lt "$max_min" ]; do
    sleep 120; waited=$((waited + 2))
  done
  [ -f "$ds" ] || { echo "[q7] $ds missing after ${waited}m"; return 1; }
  while :; do
    s1=$(stat -c %s "$ds"); sleep 30; s2=$(stat -c %s "$ds")
    [ "$s1" = "$s2" ] && break
  done
  echo "[q7] $ds ready ($(du -h "$ds" | cut -f1)) after ${waited}m"
}

step bench_train_b2 1800 python scripts/bench_train.py --reps 3 --batch 2
step bench_train_b8 2400 python scripts/bench_train.py --reps 5 --batch 8
step bench_train_b16 2400 python scripts/bench_train.py --reps 5 --batch 16 \
  --skip_fused
step bench_sparse 2700 python scripts/bench_sparse.py --reps 3 --iters 2000

if wait_ds datasets/Random_QP_1000_2000.npz 60; then
  step wk_Random_QP 5400 python scripts/run_workload.py Random_QP \
    --hours 0.9 --no_epoch_scan
fi
if wait_ds datasets/SVM_2000_500.npz 90; then
  step wk_SVM 4500 python scripts/run_workload.py SVM --hours 0.6 \
    --no_epoch_scan
fi
if wait_ds datasets/QP_RHS_1500_750_750.npz 120; then
  step wk_QP_RHS_1500 4200 python scripts/run_workload.py QP_RHS_1500 \
    --hours 0.7
fi
if wait_ds datasets/QP_1500_750_750.npz 150; then
  step wk_QP_1500 4500 python scripts/run_workload.py QP_1500 \
    --hours 0.7 --no_epoch_scan
fi

echo "[q7] all done $(date)"
