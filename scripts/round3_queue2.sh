#!/bin/bash
# Round-3 queue, phase 2: after the epoch-scan-fixed Random_QP run, refresh
# the QP eval artifact, drain the remaining canonical workloads as their
# datasets land (SVM + the 1500 sizes are still oracle-labeling on CPU),
# then the throughput/sparse benches.  One TPU job at a time (CLAUDE.md).
# Dataset waits block indefinitely — the generators are known to be running;
# kill this queue by PID if they die instead.
# Usage: nohup bash scripts/round3_queue2.sh [WAIT_PID] > /tmp/round3_q2.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  echo "[q2] waiting for PID $WAIT_PID ..."
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "[q2] PID $WAIT_PID done at $(date)"
fi

wait_dataset() {
  local ds="$1" waited=0
  while [ ! -f "$ds" ]; do
    [ $((waited % 10)) -eq 0 ] && echo "[q2] waiting for $ds (${waited}m)"
    sleep 120; waited=$((waited + 2))
  done
  local s1 s2
  s1=$(stat -c %s "$ds"); sleep 30; s2=$(stat -c %s "$ds")
  while [ "$s1" != "$s2" ]; do
    echo "[q2] $ds still being written"; sleep 60
    s1="$s2"; s2=$(stat -c %s "$ds")
  done
}

step() {
  local name="$1" tmo="$2"; shift 2
  echo "[q2] ==== $name start $(date) ===="
  timeout "$tmo" "$@" > "/tmp/q2_${name}.log" 2>&1
  echo "[q2] ==== $name exit=$? end $(date) ===="
}

# 1. QP flagship: evaluate the epoch-54 gate checkpoint (training already
#    done this round; the old artifacts/QP_full.json is the round-2 model).
step eval_QP 2400 python scripts/run_workload.py QP --skip_train

# 2. Sparse_QP device-sparse training demo (tiny dataset generated in-step)
#    + the density-crossover bench (VERDICT r2 #5).
step wk_Sparse_QP 3600 python scripts/run_workload.py Sparse_QP --hours 0.35 --data_size 200
step bench_sparse 2400 python scripts/bench_sparse.py --reps 3

# 3. SVM when its dataset lands (CPU labeler has been on it for hours).
wait_dataset datasets/SVM_2000_500.npz
step wk_SVM 5400 python scripts/run_workload.py SVM --hours 0.9

# 4-5. The 1500 sizes when their datasets land.
wait_dataset datasets/QP_1500_750_750.npz
step wk_QP_1500 6600 python scripts/run_workload.py QP_1500 --hours 1.2
wait_dataset datasets/QP_RHS_1500_750_750.npz
step wk_QP_RHS_1500 6000 python scripts/run_workload.py QP_RHS_1500 --hours 1.0

# 6. Throughput-mode training rows (VERDICT r2 #7).
step bench_train_b2 2400 python scripts/bench_train.py --reps 5 --batch 2
step bench_train_b8 2400 python scripts/bench_train.py --reps 5 --batch 8
step bench_train_b16 2400 python scripts/bench_train.py --reps 5 --batch 16 --skip_fused

echo "[q2] all done $(date)"
