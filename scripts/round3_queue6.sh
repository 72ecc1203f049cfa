#!/bin/bash
# Round-3 queue, phase 6 (chains after phase 5): evaluate the Random_QP
# epoch-15 checkpoint (its training run hung on a worker stall after the
# gate was long met; the in-run eval never happened), then a QP flagship
# resume if chip time remains before the round-end driver bench.
# Usage: nohup bash scripts/round3_queue6.sh [WAIT_PID] > /tmp/round3_q6.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
echo $$ > /tmp/round3_q6.shell.pid

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  echo "[q6] waiting for PID $WAIT_PID ..."
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  echo "[q6] PID $WAIT_PID done at $(date)"
fi

step() {
  local name="$1" tmo="$2"; shift 2
  echo "[q6] ==== $name start $(date) ===="
  timeout "$tmo" "$@" > "/tmp/q6_${name}.log" 2>&1
  echo "[q6] ==== $name exit=$? end $(date) ===="
}

step eval_Random_QP 3000 python scripts/run_workload.py Random_QP --skip_train

echo "[q6] all done $(date)"
