"""iadmm_tpu — TPU-native learned inexact-ADMM QP solver framework.

A from-scratch JAX/XLA/Pallas implementation with the full capability
surface of NetSysOpt/I-ADMM-LSTM (see SURVEY.md for the structural map of
the reference this was built against).
"""

from . import problems, scaling, solvers, train, dist, evaluation, kernels, utils
from .config import ExperimentConfig
from .types import QPBatch, IterState, ScalingState, init_state, make_eq_mask
from .api import make_solver, solve_qp_batch, SolveResult

__version__ = "0.1.0"

__all__ = [
    "problems", "scaling", "solvers", "train", "dist", "evaluation",
    "kernels", "utils", "ExperimentConfig", "QPBatch", "IterState",
    "ScalingState", "init_state", "make_eq_mask",
    "make_solver", "solve_qp_batch", "SolveResult",
]
