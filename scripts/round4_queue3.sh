#!/bin/bash
# Round-4 chip queue, phase 3: remainder after SVM + bench_train_b8.
# (Phases 1-2 raced after a PID-capture mixup — the nohup wrapper's PID is
# not the script shell's; this phase runs alone.  Waits on the in-flight
# bench_train_b8 python, then drains the remaining canonical steps.)
# Usage: nohup bash scripts/round4_queue3.sh <bench_pid> \
#          >> results/canonical/logs/round4_queue.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p results/canonical/logs
echo $$ > /tmp/round4_queue3.shell.pid

wait_backend() {
  local max_min="${1:-90}" w=0
  while [ "$w" -lt "$max_min" ]; do
    if timeout 180 python -c \
      "import jax; print(float((jax.numpy.zeros(())+1.0).sum()))" \
      >/dev/null 2>&1; then
      echo "[q4c] backend healthy after ${w}m"; return 0
    fi
    sleep 60; w=$((w+1))
  done
  echo "[q4c] backend still down after ${max_min}m"; return 1
}

step() {
  local name="$1" tmo="$2"; shift 2
  wait_backend 90 || { echo "[q4c] SKIP $name (backend down)"; return 1; }
  echo "[q4c] ==== $name start $(date) ===="
  timeout "$tmo" "$@" > "results/canonical/logs/${name}_r4.log" 2>&1
  echo "[q4c] ==== $name exit=$? end $(date) ===="
}

PREV_PID="${1:-0}"
if [ "$PREV_PID" -gt 0 ]; then
  w=0
  while kill -0 "$PREV_PID" 2>/dev/null && [ "$w" -lt 50 ]; do
    sleep 60; w=$((w+1))
  done
  echo "[q4c] previous job (pid $PREV_PID) done after ${w}m"
fi

step wk_QP_RHS_1500 5700 python scripts/run_workload.py QP_RHS_1500 \
  --hours 1.3 --no_epoch_scan

step wk_Random_QP 6000 python scripts/run_workload.py Random_QP \
  --hours 1.25 --resume --no_epoch_scan

if ! python - <<'PY' 2>/dev/null
import json, sys
d = json.load(open("artifacts/QP_1500_full.json"))
sys.exit(0 if d.get("parallel_time") else 1)
PY
then
  step wk_QP_1500_retry 6000 python scripts/run_workload.py QP_1500 \
    --hours 1.3 --no_epoch_scan --resume
fi

step wk_Sparse_QP 2400 python scripts/run_workload.py Sparse_QP --hours 0.4
step wk_Portfolio 2400 python scripts/run_workload.py Portfolio --hours 0.4

# QP_RHS with the (now default) clip=1.0: must pass epoch 174 un-derailed
step wk_QP_RHS 4200 python scripts/run_workload.py QP_RHS --hours 0.9

step bench_sparse 2100 python scripts/bench_sparse.py

step bench_train_b2 2100 python scripts/bench_train.py --batch 2 --reps 5

echo "[q4c] all done $(date)"
