"""K-step unrolled rollouts as ``lax.scan``, with TBPTT chunking and
fully-on-device per-iteration evaluation traces.

The reference drives the hot loop from Python (reference: main.py:336-358
train, 874-890 test) and syncs metrics to host every iteration
(reference: main.py:949-978).  Here a whole rollout — including the per-
iteration unscale dance and metric evaluation — is one compiled scan; the
host sees only the final stacked trace arrays.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..types import IterState, QPBatch, ScalingState
from ..evaluation import metrics
from .step import kkt_residual, _schedules
from . import exact as exact_mod

StepFn = Callable  # step(params, t, state, data, sigma) -> IterState


def rollout(step_fn: StepFn, params, state: IterState, data: QPBatch,
            sigma, num_iters: int, t0: int = 0) -> IterState:
    """Roll ``num_iters`` learned steps; returns the final state."""

    def body(st, t):
        return step_fn(params, t, st, data, sigma), None

    ts = t0 + jnp.arange(num_iters)
    final, _ = jax.lax.scan(body, state, ts)
    return final


def chunk_loss(step_fn: StepFn, params, state: IterState, data: QPBatch,
               sigma, chunk_len: int, outer_T: int,
               t0, remat: bool = False) -> Tuple[jax.Array, IterState]:
    """TBPTT chunk objective: sum over the chunk of
    mean_batch(primal+dual residual)/outer_T
    (reference: main.py:336-347).

    ``remat=True`` rematerialises each step in the backward pass
    (``jax.checkpoint`` inside the scan) — activation memory drops from
    O(chunk_len · per-step) to O(per-step), the TPU play for the reference's
    long-K workloads (Equality_QP K=400, Random_QP K=600; SURVEY.md §5
    long-context row)."""

    def body(st, t):
        st = step_fn(params, t, st, data, sigma)
        _, _, l = metrics.primal_dual_loss(st.x, st.y, st.z, data)
        return st, l.mean()

    if remat:
        body = jax.checkpoint(body)

    ts = t0 + jnp.arange(chunk_len)
    final, losses = jax.lax.scan(body, state, ts)
    return losses.sum() / outer_T, final


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class EvalTrace:
    """Per-iteration test-time traces, all shaped (T,) after the scan —
    the on-device equivalent of the reference's per-t printed table
    (reference: main.py:949-978, 1117-1161)."""
    obj: jax.Array
    primal_res: jax.Array
    dual_res: jax.Array
    ls_res: jax.Array
    violations: Dict[str, jax.Array]


def _unscale(st: IterState, scaling: Optional[ScalingState]):
    if scaling is None:
        return st.x, st.y, st.z
    return scaling.unscale_x(st.x), scaling.unscale_y(st.y), \
        scaling.unscale_z(st.z)


def eval_rollout(step_fn: StepFn, params, state: IterState,
                 data_scaled: QPBatch, data_orig: QPBatch,
                 scaling: Optional[ScalingState], sigma,
                 num_iters: int,
                 metrics_mode: str = "default") -> Tuple[IterState, EvalTrace]:
    """Test rollout with per-iteration metrics.

    Metric conventions copied from the reference test loop:
      * objective / primal / dual residuals / violations in the ORIGINAL
        (unscaled) space against the pre-scaling data
        (reference: main.py:892-978);
      * linear-system residual ‖Ã·xv_new − b̃_old‖ in the SCALED space with
        b̃ built from the pre-update iterates (reference: main.py:952-953,
        A_tild/b_tild are returned by the model before the update).
    """

    def body(st, t):
        rho_vec, _ = _schedules(params, t, data_scaled.eq_mask)
        old = st
        st = step_fn(params, t, st, data_scaled, sigma)
        # ls_res in scaled space, b̃ from pre-update x/y/z.
        r1, r2 = kkt_residual(data_scaled, st.xv, old.x, old.y, old.z,
                              sigma, rho_vec, metrics_mode)
        ls = jnp.linalg.norm(jnp.concatenate([r1, r2], -1), axis=-1).mean()
        x_u, y_u, z_u = _unscale(st, scaling)
        obj = metrics.obj_fn(x_u, data_orig.Q, data_orig.p,
                             metrics_mode).mean()
        pr, dr = metrics.primal_dual_residual(x_u, y_u, z_u, data_orig.Q,
                                              data_orig.p, data_orig.A0,
                                              metrics_mode)
        vio = metrics.violation_stats(x_u, data_orig, metrics_mode)
        ys = dict(obj=obj, primal_res=pr.mean(), dual_res=dr.mean(), ls=ls,
                  vio=vio)
        return st, ys

    ts = jnp.arange(num_iters)
    final, ys = jax.lax.scan(body, state, ts)
    trace = EvalTrace(obj=ys["obj"], primal_res=ys["primal_res"],
                      dual_res=ys["dual_res"], ls_res=ys["ls"],
                      violations=ys["vio"])
    return final, trace


def eval_stage2(state: IterState, data_scaled: QPBatch, data_orig: QPBatch,
                scaling: Optional[ScalingState], sigma,
                rho_vec: jax.Array, num_iters: int,
                metrics_mode: str = "default"
                ) -> Tuple[IterState, EvalTrace]:
    """Stage-II polish with per-iteration traces.

    The reference runs Stage II on the UNSCALED data with the last learned
    rho_vec (reference: main.py:1017-1064): after the learned rollout it
    swaps the original data back in and unscales the iterates once, then
    iterates the exact LU step in original space.  We mirror that: callers
    should pass ``data_scaled = data_orig`` and pre-unscaled state (use
    :func:`unscale_state`), with ``scaling=None``.
    """
    lu, piv = exact_mod.lu_factorize(data_scaled, sigma, rho_vec)

    def body(st, _):
        old = st
        st = exact_mod.exact_step(lu, piv, rho_vec, st, data_scaled, sigma)
        r1, r2 = kkt_residual(data_scaled, st.xv, old.x, old.y, old.z,
                              sigma, rho_vec, metrics_mode)
        ls = jnp.linalg.norm(jnp.concatenate([r1, r2], -1), axis=-1).mean()
        x_u, y_u, z_u = _unscale(st, scaling)
        obj = metrics.obj_fn(x_u, data_orig.Q, data_orig.p,
                             metrics_mode).mean()
        pr, dr = metrics.primal_dual_residual(x_u, y_u, z_u, data_orig.Q,
                                              data_orig.p, data_orig.A0,
                                              metrics_mode)
        vio = metrics.violation_stats(x_u, data_orig, metrics_mode)
        return st, dict(obj=obj, primal_res=pr.mean(), dual_res=dr.mean(),
                        ls=ls, vio=vio)

    final, ys = jax.lax.scan(body, state, None, length=num_iters)
    trace = EvalTrace(obj=ys["obj"], primal_res=ys["primal_res"],
                      dual_res=ys["dual_res"], ls_res=ys["ls"],
                      violations=ys["vio"])
    return final, trace


def unscale_state(state: IterState, scaling: ScalingState) -> IterState:
    """Map iterates back to original space before Stage II
    (reference: main.py:1024-1027)."""
    return IterState(x=scaling.unscale_x(state.x),
                     y=scaling.unscale_y(state.y),
                     z=scaling.unscale_z(state.z),
                     xv=state.xv, H=state.H, C=state.C)
