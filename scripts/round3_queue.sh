#!/bin/bash
# Round-3 chip schedule: after the in-flight QP_RHS convergence run, prove
# the Stage-II 'kkt' default end-to-end on both canonical shapes
# (VERDICT r2 #2), then drain the remaining canonical workloads
# (VERDICT r2 #1) and finish with the throughput-mode training bench
# (VERDICT r2 #7).  One TPU job at a time (CLAUDE.md).
# Usage: nohup bash scripts/round3_queue.sh [WAIT_PID] > /tmp/round3_queue.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  echo "[q3] waiting for PID $WAIT_PID ..."
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "[q3] PID $WAIT_PID done at $(date)"
fi

wait_dataset() {
  local ds="$1" waited=0
  while [ ! -f "$ds" ] && [ "$waited" -lt "${DS_WAIT_MIN:-120}" ]; do
    [ $((waited % 10)) -eq 0 ] && echo "[q3] waiting for $ds (${waited}m)"
    sleep 120; waited=$((waited + 2))
  done
  [ -f "$ds" ] || { echo "[q3] $ds missing after ${waited}m"; return 1; }
  local s1 s2
  s1=$(stat -c %s "$ds"); sleep 20; s2=$(stat -c %s "$ds")
  [ "$s1" = "$s2" ] || { echo "[q3] $ds still being written"; sleep 120; }
}

step() {
  local name="$1" tmo="$2"; shift 2
  echo "[q3] ==== $name start $(date) ===="
  timeout "$tmo" "$@" > "/tmp/q3_${name}.log" 2>&1
  echo "[q3] ==== $name exit=$? end $(date) ===="
}

# 1. Stage-II kkt-vs-LU proof on the QP_RHS shape (trained ckpt, held-out
#    tail instances; reference bar: models/lu.py accuracy).
wait_dataset datasets/QP_RHS_1000_500_500.npz && \
step serve_qprhs 2400 python scripts/bench_serve.py --reps 4 --feas_rest 20 \
  --ckpt results/canonical/lstm/params/QP_RHS_1000_500_500_100_400 \
  --dataset datasets/QP_RHS_1000_500_500.npz --hidden 400

# 2. QP flagship training (full 940-instance protocol).
wait_dataset datasets/QP_1000_500_500.npz && \
step wk_QP 7200 python scripts/run_workload.py QP --hours 1.4

# 3. Stage-II proof on the eq-rows QP flagship — the shape where round-2's
#    fused row recorded primal 5.85 vs 0.047 for LU.
step serve_qp 2400 python scripts/bench_serve.py --reps 4 --feas_rest 40 \
  --ckpt results/canonical/lstm/params/QP_1000_500_500_100_800 \
  --dataset datasets/QP_1000_500_500.npz --hidden 800

# 4-7. Remaining canonical workloads (reference: scripts/Synthetic.sh).
wait_dataset datasets/Random_QP_1000_2000.npz && \
step wk_Random_QP 7800 python scripts/run_workload.py Random_QP --hours 1.4
wait_dataset datasets/SVM_2000_500.npz && \
step wk_SVM 5400 python scripts/run_workload.py SVM --hours 0.8
wait_dataset datasets/QP_1500_750_750.npz && \
step wk_QP_1500 6600 python scripts/run_workload.py QP_1500 --hours 1.2
wait_dataset datasets/QP_RHS_1500_750_750.npz && \
step wk_QP_RHS_1500 6000 python scripts/run_workload.py QP_RHS_1500 --hours 1.0

# 8. Throughput-mode training bench: the reference's B=2 protocol is
#    latency-bound; B=8/16 shows what the chip does when throughput-bound.
step bench_train_b2 2400 python scripts/bench_train.py --reps 5 --batch 2
step bench_train_b8 2400 python scripts/bench_train.py --reps 5 --batch 8
step bench_train_b16 2400 python scripts/bench_train.py --reps 5 --batch 16

echo "[q3] all done $(date)"
