#!/usr/bin/env bash
# Canonical experiment launcher — every published workload of the reference
# (reference: scripts/Synthetic.sh:1-37) expressed against the TPU CLI.
# Usage: scripts/synthetic.sh <family>   (QP | QP_1500 | QP_RHS | QP_RHS_1500
#                                         | Equality_QP | Random_QP | SVM)
set -euo pipefail
cd "$(dirname "$0")/.."
T="python -m iadmm_tpu.cli.train --generate"

case "${1:-QP}" in
  QP)           # Synthetic.sh:3
    $T --prob_type QP --num_var 1000 --num_ineq 500 --num_eq 500 \
       --outer_T 100 --truncated_length 100 --hidden_dim 800 \
       --eq_tol 0.2 --ineq_tol 0.2 "${@:2}" ;;
  QP_1500)      # Synthetic.sh:8
    $T --prob_type QP --num_var 1500 --num_ineq 750 --num_eq 750 \
       --outer_T 100 --truncated_length 100 --hidden_dim 800 \
       --eq_tol 0.2 --ineq_tol 0.2 "${@:2}" ;;
  QP_RHS)       # Synthetic.sh:13
    $T --prob_type QP_RHS --num_var 1000 --num_ineq 500 --num_eq 500 \
       --outer_T 100 --truncated_length 100 --hidden_dim 400 \
       --eq_tol 0.2 --ineq_tol 0.2 "${@:2}" ;;
  QP_RHS_1500)  # Synthetic.sh:18
    $T --prob_type QP_RHS --num_var 1500 --num_ineq 750 --num_eq 750 \
       --outer_T 150 --truncated_length 150 --hidden_dim 400 \
       --eq_tol 0.2 --ineq_tol 0.2 "${@:2}" ;;
  Equality_QP)  # Synthetic.sh:24 (K=400, TBPTT 200; remat bounds activation memory)
    $T --prob_type Equality_QP --num_var 1000 --num_eq 500 \
       --outer_T 400 --truncated_length 200 --hidden_dim 200 \
       --eq_tol 0.5 --ineq_tol 0.5 --remat true "${@:2}" ;;
  Random_QP)    # Synthetic.sh:29 (K=600, TBPTT 150; remat bounds activation memory)
    $T --prob_type Random_QP --num_var 1000 --num_ineq 2000 \
       --outer_T 600 --truncated_length 150 --hidden_dim 200 \
       --eq_tol 1.0 --ineq_tol 1.0 --remat true "${@:2}" ;;
  SVM)          # Synthetic.sh:35 (K=50)
    $T --prob_type SVM --num_var 1500 --num_ineq 500 \
       --outer_T 50 --truncated_length 50 --hidden_dim 800 \
       --eq_tol 0.01 --ineq_tol 0.01 "${@:2}" ;;
  *) echo "unknown family: $1" >&2; exit 1 ;;
esac
