#!/bin/bash
# Sequential canonical-workload queue for the single TPU chip.
# Waits for an (optional) in-flight run PID, then trains each family under a
# wall-clock budget (run_workload.py --hours), skipping families whose dataset
# has not been generated yet at its turn (retried once at the end).
# Usage: nohup bash scripts/chip_queue.sh [WAIT_PID] > /tmp/chip_queue.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  echo "[queue] waiting for PID $WAIT_PID to exit..."
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "[queue] PID $WAIT_PID done at $(date)"
fi

# Training-step micro-bench first: ~10 min of chip (2 compiles + reps),
# records artifacts/train_bench.json for BASELINE.  SKIP_BENCH=1 skips it
# (e.g. when it was already run directly this session).
if [ "${SKIP_BENCH:-0}" != "1" ]; then
  echo "[queue] ==== bench_train start $(date) ===="
  timeout 2400 python scripts/bench_train.py --reps 5 > /tmp/bench_train.log 2>&1
  echo "[queue] ==== bench_train exit=$? end $(date) ===="
fi

declare -A HOURS=(
  [Equality_QP]=1.2 [QP_RHS]=1.0 [SVM]=0.8
  [Random_QP]=1.2 [QP_RHS_1500]=1.0 [QP_1500]=1.2
)
# FAMILIES overrides the default order, e.g. to resume a partial queue:
#   FAMILIES="SVM Random_QP" nohup bash scripts/chip_queue.sh ... &
ORDER="${FAMILIES:-Equality_QP QP_RHS SVM Random_QP QP_RHS_1500 QP_1500}"

dataset_file() {
  case "$1" in
    Equality_QP) echo datasets/Equality_QP_1000_500.npz ;;
    QP_RHS) echo datasets/QP_RHS_1000_500_500.npz ;;
    SVM) echo datasets/SVM_2000_500.npz ;;
    Random_QP) echo datasets/Random_QP_1000_2000.npz ;;
    QP_RHS_1500) echo datasets/QP_RHS_1500_750_750.npz ;;
    QP_1500) echo datasets/QP_1500_750_750.npz ;;
  esac
}

run_family() {
  local fam="$1" budget="$2" ds waited
  ds=$(dataset_file "$fam")
  # wait up to DS_WAIT_MIN (default 90) minutes for the generator to land it
  waited=0
  while [ ! -f "$ds" ] && [ "$waited" -lt "${DS_WAIT_MIN:-90}" ]; do
    [ $((waited % 10)) -eq 0 ] && \
      echo "[queue] $fam: waiting for $ds (${waited}m)"
    sleep 120; waited=$((waited + 2))
  done
  if [ ! -f "$ds" ]; then
    echo "[queue] $fam: dataset $ds missing after ${waited}m, skipping"
    return 1
  fi
  # guard against a partially-written npz (generator still running)
  local s1 s2
  s1=$(stat -c %s "$ds"); sleep 20; s2=$(stat -c %s "$ds")
  if [ "$s1" != "$s2" ]; then
    echo "[queue] $fam: dataset still being written, skipping for now"
    return 1
  fi
  echo "[queue] ==== $fam (budget ${budget}h) start $(date) ===="
  timeout $(awk "BEGIN{print int(($budget+1.0)*3600)}") \
    python scripts/run_workload.py "$fam" --hours "$budget" \
    > "/tmp/wk_${fam}.log" 2>&1
  echo "[queue] ==== $fam exit=$? end $(date) ===="
}

PENDING=""
for fam in $ORDER; do
  run_family "$fam" "${HOURS[$fam]}" || PENDING="$PENDING $fam"
done
# one retry pass for families whose datasets arrived late
for fam in $PENDING; do
  run_family "$fam" "${HOURS[$fam]}" || echo "[queue] $fam: still no dataset"
done
echo "[queue] all done $(date)"
