#!/bin/bash
# Round-5 chip queue, phase 2 (launch AFTER round5_queue2.sh finishes):
#   1. Sparse_QP canonical convergence run (VERDICT r4 #2) — the new
#      device-resident sparse cache (train/preload.py) removes the
#      per-epoch reconversion that made round-4 epochs 9-16 min; BSR route.
#   2. Sparse_QP_Large (n=4096 banded, VERDICT r4 #3): short train smoke
#      on the BSR route at the scale it was built for.
#   3. bench_sparse at n=4096 (HBM-resident operands): the dense-vs-BSR
#      matvec win measurement.
#   4. int8 gates speed-of-light microbench (VERDICT r4 #6).
# Usage: nohup bash scripts/round5_queue3.sh \
#          > results/canonical/logs/round5_queue3.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p results/canonical/logs
echo $$ > /tmp/round5_queue3.shell.pid
STALL_MIN=25

wait_backend() {
  local max_min="${1:-90}" w=0
  while [ "$w" -lt "$max_min" ]; do
    if timeout 180 python -c \
      "import jax; print(float((jax.numpy.zeros(())+1.0).sum()))" \
      >/dev/null 2>&1; then
      echo "[q5p2] backend healthy after ${w}m"; return 0
    fi
    sleep 60; w=$((w+1))
  done
  echo "[q5p2] backend still down after ${max_min}m"; return 1
}

run_watched() {
  local log="$1" tmo="$2"; shift 2
  "$@" > "$log" 2>&1 &
  local pid=$!
  local start now age
  start=$(date +%s)
  while kill -0 "$pid" 2>/dev/null; do
    sleep 60
    now=$(date +%s)
    if [ $((now - start)) -gt "$tmo" ]; then
      echo "[q5p2] timeout ${tmo}s; killing $pid"
      kill "$pid" 2>/dev/null; sleep 10; kill -9 "$pid" 2>/dev/null
      return 124
    fi
    age=$(( now - $(stat -c %Y "$log" 2>/dev/null || echo "$now") ))
    if [ "$age" -gt $((STALL_MIN * 60)) ]; then
      echo "[q5p2] STALL: $log silent ${age}s; killing $pid"
      kill "$pid" 2>/dev/null; sleep 10; kill -9 "$pid" 2>/dev/null
      return 2
    fi
  done
  wait "$pid"
}

step() {
  local name="$1" tmo="$2"; shift 2
  wait_backend 90 || { echo "[q5p2] SKIP $name (backend down)"; return 1; }
  echo "[q5p2] ==== $name start $(date) ===="
  run_watched "results/canonical/logs/${name}_r5.log" "$tmo" "$@"
  local rc=$?
  echo "[q5p2] ==== $name exit=$rc end $(date) ===="
  if [ "$rc" -eq 2 ]; then
    wait_backend 90 || return 1
    echo "[q5p2] ==== $name RETRY start $(date) ===="
    run_watched "results/canonical/logs/${name}_r5b.log" "$tmo" "$@"
    echo "[q5p2] ==== $name RETRY exit=$? end $(date) ===="
  fi
}

# 1. Sparse_QP convergence (cache route; resume from round-4 _latest)
step wk_Sparse_QP 6600 python scripts/run_workload.py Sparse_QP \
  --hours 1.4 --resume --sparse_format bsr --no_epoch_scan

# 2. Sparse_QP_Large train smoke (needs datasets/Sparse_QP_4096_1024.npz)
if [ -f datasets/Sparse_QP_4096_1024.npz ]; then
  step wk_Sparse_QP_Large 4800 python scripts/run_workload.py \
    Sparse_QP_Large --data_size 64 --hours 0.9 --sparse_format bsr \
    --no_epoch_scan
fi

# 3. large-n sparse matvec bench (HBM-resident)
step bench_sparse_large 3600 python scripts/bench_sparse.py \
  --n 4096 --batch 4 --iters 30 --widths 16 64 256 --step_bench --hidden 128

# 4. int8 gates microbench
step bench_int8 1800 python scripts/bench_int8_gates.py

echo "[q5p2] phase-2 done $(date)"
