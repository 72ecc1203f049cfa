#!/bin/bash
# Round-5 chip queue, phase 1: the VERDICT r4 convergence drain.
#   1. QP_1500 top-up resume (gate eq/ineq<=0.2; _latest @ epoch 41,
#      eq_max 0.257 falling ~0.004/epoch -> ~2h of 150s epochs)
#   2. QP_RHS_1500 fresh run (its round-4 run predates the _latest
#      checkpoint feature, so no resume point exists; 113 s/epoch,
#      sibling QP_RHS gated at epoch 42 -> 2.6h budget)
#   3. Random_QP top-up resume (gap 4.9% @ 19 epochs -> target <=2%)
# Phase 2 (Sparse_QP long run, large-n BSR bench, int8 serve) is queued
# separately once the sparse-path epoch-time fix lands.
# Usage: nohup bash scripts/round5_queue.sh \
#          > results/canonical/logs/round5_queue.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p results/canonical/logs
echo $$ > /tmp/round5_queue.shell.pid

wait_backend() {
  local max_min="${1:-90}" w=0
  while [ "$w" -lt "$max_min" ]; do
    if timeout 180 python -c \
      "import jax; print(float((jax.numpy.zeros(())+1.0).sum()))" \
      >/dev/null 2>&1; then
      echo "[q5] backend healthy after ${w}m"; return 0
    fi
    sleep 60; w=$((w+1))
  done
  echo "[q5] backend still down after ${max_min}m"; return 1
}

step() {
  local name="$1" tmo="$2"; shift 2
  wait_backend 90 || { echo "[q5] SKIP $name (backend down)"; return 1; }
  echo "[q5] ==== $name start $(date) ===="
  timeout "$tmo" "$@" > "results/canonical/logs/${name}_r5.log" 2>&1
  echo "[q5] ==== $name exit=$? end $(date) ===="
}

# 1. QP_1500 top-up (the #1 verdict item)
step wk_QP_1500_topup 9600 python scripts/run_workload.py QP_1500 \
  --hours 2.1 --resume --no_epoch_scan

# 2. QP_RHS_1500 from scratch
step wk_QP_RHS_1500 11400 python scripts/run_workload.py QP_RHS_1500 \
  --hours 2.6 --resume --no_epoch_scan

# 3. Random_QP convergence top-up
step wk_Random_QP_topup 6000 python scripts/run_workload.py Random_QP \
  --hours 1.1 --resume --no_epoch_scan

echo "[q5] phase-1 done $(date)"
