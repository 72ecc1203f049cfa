from .step import (CELL_REGISTRY, get_cell, lstm_step, gru_step, gd_step,
                   safeguard_lstm_step, multi_layer_lstm_step,
                   indirect_lstm_step, kkt_feature, kkt_residual,
                   kkt_matvec, kkt_rhs, admm_update, rho_vector,
                   RHO_EQ_OVER_RHO_INEQ)
from .exact import (build_kkt, lu_factorize, exact_step,
                    feasibility_restoration, ALPHA_STAGE2)
from .rollouts import (rollout, chunk_loss, eval_rollout, eval_stage2,
                      unscale_state, EvalTrace)
from . import cells

__all__ = [
    "CELL_REGISTRY", "get_cell", "lstm_step", "gru_step", "gd_step",
    "safeguard_lstm_step", "multi_layer_lstm_step", "indirect_lstm_step",
    "kkt_feature", "kkt_residual", "kkt_matvec", "kkt_rhs", "admm_update",
    "rho_vector", "RHO_EQ_OVER_RHO_INEQ",
    "build_kkt", "lu_factorize", "exact_step", "feasibility_restoration",
    "ALPHA_STAGE2", "rollout", "chunk_loss", "eval_rollout", "eval_stage2",
    "unscale_state", "EvalTrace", "cells",
]
