#!/bin/bash
# Round-3 queue, phase 5: the three crash-prone canonical workloads retry on
# the epoch_scan=False route (device-resident preload, per-batch dispatch —
# no giant epoch program for the worker to die on, no host staging to leak),
# then benches, verify, and the probe evals.  Writes its shell PID to
# /tmp/round3_q5.shell.pid.
set -u
cd "$(dirname "$0")/.."
echo $$ > /tmp/round3_q5.shell.pid

step() {
  local name="$1" tmo="$2"; shift 2
  echo "[q5] ==== $name start $(date) ===="
  timeout "$tmo" "$@" > "/tmp/q5_${name}.log" 2>&1
  echo "[q5] ==== $name exit=$? end $(date) ===="
}

step wk_Random_QP 7200 python scripts/run_workload.py Random_QP \
  --hours 1.2 --no_epoch_scan
step wk_SVM 5400 python scripts/run_workload.py SVM --hours 0.8 \
  --no_epoch_scan
step wk_QP_1500 6000 python scripts/run_workload.py QP_1500 --hours 1.0 \
  --no_epoch_scan
step wk_QP_RHS_1500 5400 python scripts/run_workload.py QP_RHS_1500 \
  --hours 0.9

step bench_train_b2 2400 python scripts/bench_train.py --reps 5 --batch 2
step bench_train_b8 2400 python scripts/bench_train.py --reps 5 --batch 8
step bench_train_b16 2400 python scripts/bench_train.py --reps 5 --batch 16 --skip_fused
step bench_sparse 2400 python scripts/bench_sparse.py --reps 3 --iters 4000

step verify 1200 python /tmp/verify_run.py
step eval_Sparse_QP 1800 python scripts/run_workload.py Sparse_QP \
  --skip_train --data_size 200
step eval_EqQP_K800 2400 python scripts/run_workload.py Equality_QP \
  --skip_train --test_outer_T 800 --out artifacts/Equality_QP_K800.json

echo "[q5] all done $(date)"
