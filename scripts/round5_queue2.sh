#!/bin/bash
# Round-5 chip queue v2: phase-1 convergence drain with a STALL WATCHDOG.
# New failure mode seen this round: the training process can hang forever
# on a device fetch after a worker crash (no UNAVAILABLE raised -> the
# in-process recovery never fires; process sits at 0% CPU while the
# backend is already healthy again).  Only an external monitor can break
# that, so each step runs under a log-mtime watchdog: no log output for
# STALL_MIN minutes -> kill the exact PID and retry once (training
# resumes from the periodic _latest checkpoint).
# Usage: nohup bash scripts/round5_queue2.sh \
#          > results/canonical/logs/round5_queue2.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p results/canonical/logs
echo $$ > /tmp/round5_queue2.shell.pid
STALL_MIN=20   # compiles on this backend can be silently slow (~8 min);
               # 20 min of total silence is unambiguous

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

run_watched() {
  # run_watched <logfile> <timeout_s> cmd...
  local log="$1" tmo="$2"; shift 2
  "$@" > "$log" 2>&1 &
  local pid=$!
  local start now age
  start=$(date +%s)
  while kill -0 "$pid" 2>/dev/null; do
    sleep 60
    now=$(date +%s)
    if [ $((now - start)) -gt "$tmo" ]; then
      echo "[q5] timeout ${tmo}s; killing $pid"
      kill "$pid" 2>/dev/null; sleep 10; kill -9 "$pid" 2>/dev/null
      return 124
    fi
    age=$(( now - $(stat -c %Y "$log" 2>/dev/null || echo "$now") ))
    if [ "$age" -gt $((STALL_MIN * 60)) ]; then
      echo "[q5] STALL: $log silent ${age}s; killing $pid"
      kill "$pid" 2>/dev/null; sleep 10; kill -9 "$pid" 2>/dev/null
      return 2
    fi
  done
  wait "$pid"
}

step() {
  # step <name> <timeout_s> cmd...  — one stall-retry (resume continues)
  local name="$1" tmo="$2"; shift 2
  wait_backend 90 || { echo "[q5] SKIP $name (backend down)"; return 1; }
  echo "[q5] ==== $name start $(date) ===="
  run_watched "results/canonical/logs/${name}_r5.log" "$tmo" "$@"
  local rc=$?
  echo "[q5] ==== $name exit=$rc end $(date) ===="
  if [ "$rc" -eq 2 ]; then
    wait_backend 90 || return 1
    echo "[q5] ==== $name RETRY start $(date) ===="
    run_watched "results/canonical/logs/${name}_r5b.log" "$tmo" "$@"
    echo "[q5] ==== $name RETRY exit=$? end $(date) ===="
  fi
}

# 1. QP_1500 top-up (resume from _latest; gate eq/ineq <= 0.2)
step wk_QP_1500_topup 9000 python scripts/run_workload.py QP_1500 \
  --hours 2.0 --resume --no_epoch_scan

# 2. QP_RHS_1500 fresh (no usable checkpoint; 113 s/epoch)
step wk_QP_RHS_1500 11400 python scripts/run_workload.py QP_RHS_1500 \
  --hours 2.7 --resume --no_epoch_scan

# 3. Random_QP convergence top-up
step wk_Random_QP_topup 6000 python scripts/run_workload.py Random_QP \
  --hours 1.1 --resume --no_epoch_scan

echo "[q5] phase-1 done $(date)"
