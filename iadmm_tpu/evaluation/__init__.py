from . import metrics
from .metrics import (obj_fn, primal_dual_residual, primal_dual_loss,
                      ineq_dist, eq_dist, lb_dist, ub_dist,
                      violation_stats, aug_lagr)
from .driver import (run_test, export_traces, run_osqp_baseline, TestReport)

__all__ = ["metrics", "obj_fn", "primal_dual_residual", "primal_dual_loss",
           "ineq_dist", "eq_dist", "lb_dist", "ub_dist",
           "violation_stats", "aug_lagr",
           "run_test", "export_traces", "run_osqp_baseline", "TestReport"]
