from .step import (CELL_REGISTRY, get_cell, lstm_step, gru_step, gd_step,
                   safeguard_lstm_step, multi_layer_lstm_step,
                   indirect_lstm_step, make_lstm_step, kkt_feature,
                   kkt_residual, kkt_matvec, kkt_rhs, admm_update,
                   rho_vector, RHO_EQ_OVER_RHO_INEQ)
from .exact import (build_kkt, lu_factorize, exact_step,
                    feasibility_restoration, ALPHA_STAGE2)
from .rollouts import (rollout, chunk_loss, eval_rollout, eval_stage2,
                      unscale_state, EvalTrace)
from . import cells
from . import cg


def best_lstm_step(gate_dtype: str = "bfloat16"):
    """(step_fn, impl_name): fused Pallas step when the backend supports it
    (probed with a tiny compile), otherwise the fused-jnp XLA step."""
    import jax
    import jax.numpy as jnp
    try:
        from ..kernels.lstm_cell import fused_lstm_cell
        from .cells import lstm_init
        p = lstm_init(jax.random.PRNGKey(0), 2, 8, 1)
        out = fused_lstm_cell(p, jnp.zeros((1, 8, 2)), jnp.zeros((1, 8, 8)),
                              jnp.zeros((1, 8, 8)), gate_dtype)
        jax.block_until_ready(out)
        mv = "bf16" if gate_dtype == "bfloat16" else None
        return make_lstm_step(use_pallas=True, gate_dtype=gate_dtype,
                              matvec_mode=mv), f"pallas-{gate_dtype}"
    except Exception:  # pragma: no cover - non-TPU backends
        return lstm_step, "xla-float32"


__all__ = [
    "CELL_REGISTRY", "get_cell", "lstm_step", "gru_step", "gd_step",
    "safeguard_lstm_step", "multi_layer_lstm_step", "indirect_lstm_step",
    "make_lstm_step", "best_lstm_step",
    "kkt_feature", "kkt_residual", "kkt_matvec", "kkt_rhs", "admm_update",
    "rho_vector", "RHO_EQ_OVER_RHO_INEQ",
    "build_kkt", "lu_factorize", "exact_step", "feasibility_restoration",
    "ALPHA_STAGE2", "rollout", "chunk_loss", "eval_rollout", "eval_stage2",
    "unscale_state", "EvalTrace", "cells", "cg",
]
