#!/bin/bash
# Round-4 chip queue, phase 4: tail after the Sparse_QP BCOO attempt hit
# the BCOO scan program's pathological compile (35+ min, killed by its own
# step timeout).  Re-runs Sparse_QP on the BSR tile-sparse route (small
# Pallas kernels, fast compile) after Portfolio + QP_RHS.
# Usage: nohup bash scripts/round4_queue4.sh <sparse_pid> \
#          >> results/canonical/logs/round4_queue.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p results/canonical/logs
echo $$ > /tmp/round4_queue4.shell.pid

wait_backend() {
  local max_min="${1:-90}" w=0
  while [ "$w" -lt "$max_min" ]; do
    if timeout 180 python -c \
      "import jax; print(float((jax.numpy.zeros(())+1.0).sum()))" \
      >/dev/null 2>&1; then
      echo "[q4d] backend healthy after ${w}m"; return 0
    fi
    sleep 60; w=$((w+1))
  done
  echo "[q4d] backend still down after ${max_min}m"; return 1
}

step() {
  local name="$1" tmo="$2"; shift 2
  wait_backend 90 || { echo "[q4d] SKIP $name (backend down)"; return 1; }
  echo "[q4d] ==== $name start $(date) ===="
  timeout "$tmo" "$@" > "results/canonical/logs/${name}_r4.log" 2>&1
  echo "[q4d] ==== $name exit=$? end $(date) ===="
}

PREV_PID="${1:-0}"
if [ "$PREV_PID" -gt 0 ]; then
  w=0
  while kill -0 "$PREV_PID" 2>/dev/null && [ "$w" -lt 45 ]; do
    sleep 60; w=$((w+1))
  done
  echo "[q4d] previous job (pid $PREV_PID) done after ${w}m"
fi

step wk_Portfolio 2400 python scripts/run_workload.py Portfolio --hours 0.4

# QP_RHS with the (now default) clip=1.0: must pass epoch 174 un-derailed
step wk_QP_RHS 4200 python scripts/run_workload.py QP_RHS --hours 0.9

# Sparse_QP on the BSR tile-sparse route
step wk_Sparse_QP_bsr 2400 python scripts/run_workload.py Sparse_QP \
  --hours 0.3 --sparse_format bsr --out artifacts/Sparse_QP_full.json

step bench_sparse 2100 python scripts/bench_sparse.py

step bench_train_b2 1800 python scripts/bench_train.py --batch 2 --reps 5

echo "[q4d] all done $(date)"
