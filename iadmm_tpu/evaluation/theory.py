"""Theory-condition traces for the paper's inexactness analysis.

The reference carries (commented-out) code computing eight per-iteration
scalar traces that verify the paper's x-/z-subproblem and relaxation
conditions, and exports them (as empty arrays) in its ``.mat`` schema
(reference: main.py:900-946 formulas, 770-778/1006-1014/1240-1262 export).
This module implements those formulas as one compiled scan per test batch
(opt-in: ``ExperimentConfig.theory``), in the ORIGINAL (unscaled) space the
reference's code operated in:

  * ``sigma_Q_max`` / ``sigma_AA_min``: extreme eigenvalues of instance 0's
    Q and A0ᵀA0 (reference: main.py:905-906 uses ``test_Q[0]``);
  * ``x_tild`` = D·xv[:n], the pre-relaxation LSTM iterate, unscaled
    (reference: main.py:907);
  * ``rho_norm``: batch-mean 2-norm of the step's rho vector
    (reference: main.py:908);
  * constants cx = cz = 1, and the (1.1, 0.9) slack factors of the
    reference's beta_x / beta_z / alpha conditions.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..types import IterState, QPBatch, ScalingState
from ..solvers.step import _schedules
from ..solvers.rollouts import _unscale
from . import metrics

COND_KEYS = ("x_cond_1_left", "x_cond_2_left", "x_cond_2_right",
             "z_cond_1_left", "z_cond_1_right", "z_cond_2_left",
             "z_cond_2_right", "alpha_cond_left", "alpha_cond_right")

# Keys the reference appends PER-INSTANCE, shape (B, 1, 1) per iteration
# (main.py:913-915 — no .mean()); every other key is a batch-mean scalar.
# Our traces mirror that: these two come out (T, B), the rest (T,)
# (ADVICE r4 #3: exact reference-diffing of the .mat schema).
PER_INSTANCE_KEYS = ("x_cond_2_left", "x_cond_2_right")


def _norm(v):
    return jnp.linalg.norm(v, axis=-1)


def theory_rollout(step_fn, params, state: IterState, data_scaled: QPBatch,
                   data_orig: QPBatch, scaling: Optional[ScalingState],
                   sigma, num_iters: int,
                   metrics_mode: str = "default") -> Dict[str, jax.Array]:
    """Per-iteration theory-condition traces — (T,) per key, except the
    ``PER_INSTANCE_KEYS`` which come out (T, B) (reference appends those
    per-instance, main.py:913-915).  Entry t=0 is NaN (the conditions
    compare successive iterates, reference ``if t>0``, main.py:903)."""
    n = data_orig.num_var
    cx = cz = 1.0
    Q0 = data_orig.Q[0].astype(jnp.float32)
    A00 = data_orig.A0[0].astype(jnp.float32)
    sigma_q_max = jnp.linalg.eigvalsh(Q0)[-1]
    sigma_aa_min = jnp.linalg.eigvalsh(A00.T @ A00)[0]

    def aug(x, z, y, rho_vec):
        return metrics.aug_lagr(x, z, y, data_orig.Q, data_orig.p,
                                data_orig.A0, rho_vec).mean()

    def bmv(M, v):
        return metrics.bmv(M, v, metrics_mode)

    def bmv_t(M, v):
        return metrics.bmv_t(M, v, metrics_mode)

    def body(st, t):
        rho_vec, _ = _schedules(params, t, data_scaled.eq_mask)
        old = st
        st = step_fn(params, t, st, data_scaled, sigma)
        x_pre, y_pre, z_pre = _unscale(old, scaling)
        x_u, y_u, z_u = _unscale(st, scaling)
        xv_x = st.xv[:, :n]
        x_tild = scaling.d * xv_x if scaling is not None else xv_x
        rho_norm = _norm(rho_vec).mean()

        # x subproblem condition 1 (reference: main.py:904-910)
        beta_x = (2 * 1.1 / 0.9) * (
            2 * (sigma_q_max / rho_norm + cx) ** 2 + 8 * cx ** 2
        ) / sigma_aa_min
        x_diff = _norm(x_tild - x_pre).mean() ** 2
        x1l = (rho_norm * x_diff * beta_x) / 2 + aug(x_tild, z_pre, y_pre,
                                                     rho_vec)

        # x subproblem condition 2 (reference: main.py:912-915)
        grad = (bmv(data_orig.Q, x_tild) + data_orig.p
                + bmv_t(data_orig.A0, y_pre)
                + bmv_t(data_orig.A0,
                        rho_vec * (bmv(data_orig.A0, x_tild) - z_pre)))
        x2l = _norm(grad)                            # per-instance, (B,)
        x2r = cx * rho_norm * _norm(x_tild - x_pre)  # per-instance, (B,)

        # z subproblem condition 1 (reference: main.py:917-928)
        z1r = aug(x_tild, z_pre, y_pre, rho_vec)
        beta_z = (32 * 1.1) / ((sigma_aa_min ** 2) * 0.9)
        z_diff = _norm(z_u - z_pre).mean() ** 2
        z1l = (rho_norm * z_diff * beta_z) / 2 + aug(x_tild, z_u, y_pre,
                                                     rho_vec)

        # z subproblem condition 2 (reference: main.py:930-938)
        resid = y_pre + rho_vec * (bmv(data_orig.A0, x_tild) - z_u)
        at_upper = jnp.logical_and(z_u == data_orig.zu, resid > 0)
        at_lower = jnp.logical_and(z_u == data_orig.zl, resid < 0)
        z_part_grad = jnp.where(jnp.logical_or(at_upper, at_lower),
                                0.0, -resid)
        z2l = _norm(z_part_grad).mean()
        z2r = (cz * rho_norm * (_norm(z_u - z_pre)
                                + _norm(x_tild - x_pre))).mean()

        # relaxation (alpha) condition (reference: main.py:941-944)
        al = aug(x_u, z_u, y_u, rho_vec)
        a_diff = _norm(x_u - x_tild).mean() ** 2
        ar = aug(x_tild, z_u, y_u, rho_vec) - 0.9 * rho_norm * a_diff

        first = t == 0
        nan = jnp.float32(jnp.nan)
        ys = dict(zip(COND_KEYS, (x1l, x2l, x2r, z1l, z1r, z2l, z2r,
                                  al, ar)))
        ys = {k: jnp.where(first, nan, v) for k, v in ys.items()}
        return st, ys

    _, ys = jax.lax.scan(body, state, jnp.arange(num_iters))
    return ys
