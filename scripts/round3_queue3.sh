#!/bin/bash
# Round-3 queue, phase 3 (replaces phase 2 after the Random_QP preloaded-
# epoch crash): drain the remaining canonical workloads — Random_QP now
# streams per-batch (--preload never; the 5.65 GB preloaded whole-epoch
# program reproducibly crashed the TPU worker even with the chunk-scan fix,
# while the identical chunk program runs fine standalone) — then the
# throughput + sparse benches, then a QP resume if time remains.
# Usage: nohup bash scripts/round3_queue3.sh [WAIT_PID] > /tmp/round3_q3.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  echo "[q3] waiting for PID $WAIT_PID ..."
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  echo "[q3] PID $WAIT_PID done at $(date)"
fi

step() {
  local name="$1" tmo="$2"; shift 2
  echo "[q3] ==== $name start $(date) ===="
  timeout "$tmo" "$@" > "/tmp/q2_${name}.log" 2>&1
  echo "[q3] ==== $name exit=$? end $(date) ===="
}

step bench_sparse 1800 python scripts/bench_sparse.py --reps 3
step wk_Random_QP 7200 python scripts/run_workload.py Random_QP \
  --hours 1.3 --preload never
step wk_SVM 5400 python scripts/run_workload.py SVM --hours 0.8
step wk_QP_1500 6000 python scripts/run_workload.py QP_1500 --hours 1.0
step wk_QP_RHS_1500 5400 python scripts/run_workload.py QP_RHS_1500 --hours 0.9
step bench_train_b2 2400 python scripts/bench_train.py --reps 5 --batch 2
step bench_train_b8 2400 python scripts/bench_train.py --reps 5 --batch 8
step bench_train_b16 2400 python scripts/bench_train.py --reps 5 --batch 16 --skip_fused
# If everything above finished with chip time to spare: resume the QP
# flagship toward its early-stop (round-2 artifact beat this round's
# 54-epoch checkpoint), with the bf16-spike clip guard on.
step wk_QP_resume 7200 python scripts/run_workload.py QP --hours 1.5 \
  --resume --clip 1.0

echo "[q3] all done $(date)"
