#!/bin/bash
# Round-3 queue, phase 4 (single authoritative chip schedule; replaces the
# phase-2/3 scripts whose nohup-wrapper kills left subshells running and
# briefly double-booked the chip).  Writes its own PID to
# /tmp/round3_q4.shell.pid — kill THAT to stop the queue; the currently
# running step (child of this shell) must be killed separately by its PID.
set -u
cd "$(dirname "$0")/.."
echo $$ > /tmp/round3_q4.shell.pid

step() {
  local name="$1" tmo="$2"; shift 2
  echo "[q4] ==== $name start $(date) ===="
  timeout "$tmo" "$@" > "/tmp/q4_${name}.log" 2>&1
  echo "[q4] ==== $name exit=$? end $(date) ===="
}

# 1. Density-crossover bench, amortizing the ~25 ms tunnel dispatch over
#    4000 in-loop matvecs (the --iters 50 run was pure dispatch latency).
step bench_sparse 2400 python scripts/bench_sparse.py --reps 3 --iters 4000

# 2-5. Remaining canonical workloads (Random_QP streams per-batch: the
#      preloaded whole-epoch program reproducibly crashes the TPU worker).
step wk_Random_QP 7200 python scripts/run_workload.py Random_QP \
  --hours 1.3 --preload never
step wk_SVM 5400 python scripts/run_workload.py SVM --hours 0.8
step wk_QP_1500 6000 python scripts/run_workload.py QP_1500 --hours 1.0
step wk_QP_RHS_1500 5400 python scripts/run_workload.py QP_RHS_1500 --hours 0.9

# 6. Throughput-mode training rows (VERDICT r2 #7).
step bench_train_b2 2400 python scripts/bench_train.py --reps 5 --batch 2
step bench_train_b8 2400 python scripts/bench_train.py --reps 5 --batch 8
step bench_train_b16 2400 python scripts/bench_train.py --reps 5 --batch 16 --skip_fused

# 7. On-chip verify of the session's library changes.
step verify 1200 python /tmp/verify_run.py

# 8. Sparse_QP eval with the fixed box-view metrics (BCOO eval compile has
#    been pathological once — bounded at 30 min, losing it is acceptable).
step eval_Sparse_QP 1800 python scripts/run_workload.py Sparse_QP \
  --skip_train --data_size 200

# 9. Equality_QP dual-decay probe beyond the training horizon: K=800 eval
#    on the K=400-trained checkpoint (indices past outer_T clamp to the
#    last learned rho/alpha — the Stage-II convention).
step eval_EqQP_K800 2400 python scripts/run_workload.py Equality_QP \
  --skip_train --test_outer_T 800 --out artifacts/Equality_QP_K800.json

# 10. QP flagship resume toward early-stop with the bf16-spike clip guard,
#     bounded so the chip is free before the round-end driver bench.
step wk_QP_resume 4500 python scripts/run_workload.py QP --hours 1.0 \
  --resume --clip 1.0

echo "[q4] all done $(date)"
