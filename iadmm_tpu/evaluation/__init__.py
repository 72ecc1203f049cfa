from . import metrics
from .metrics import (obj_fn, primal_dual_residual, primal_dual_loss,
                      ineq_dist, eq_dist, lb_dist, ub_dist,
                      violation_stats, aug_lagr)

__all__ = ["metrics", "obj_fn", "primal_dual_residual", "primal_dual_loss",
           "ineq_dist", "eq_dist", "lb_dist", "ub_dist",
           "violation_stats", "aug_lagr"]
