"""High-level solve API.

The reference has no callable solve surface — using a trained model means
editing main.py's test branch.  This wraps the full pipeline (Ruiz scaling
→ learned rollout → optional Stage-II exact polish → unscale) into one
jittable call suitable for serving: scenario-parallel over the instance
batch, no host round-trips inside the loop.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from .types import QPBatch, IterState, init_state
from .scaling import scale_batch
from .solvers.step import (get_cell, make_lstm_step, _schedules,
                           check_schedule_len)
from .solvers.rollouts import rollout, unscale_state
from .solvers import exact as exact_mod
from .evaluation import metrics


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SolveResult:
    x: jax.Array            # (B, n) primal solution (original space)
    y: jax.Array            # (B, m) dual
    z: jax.Array            # (B, m) auxiliary
    primal_res: jax.Array   # (B,)
    dual_res: jax.Array     # (B,)
    obj: jax.Array          # (B,)


def make_solver(params: Dict, *, hidden_dim: int, num_iters: int,
                sigma: float = 6e-6, scaling_iters: int = 10,
                feas_rest_num: int = 0, use_pallas: bool = False,
                gate_dtype: str = "float32",
                matvec_mode: Optional[str] = None,
                model_name: str = "lstm",
                rollout_impl: str = "step",
                stage2_impl: str = "auto"):
    """Build a jitted ``solve(data: QPBatch) -> SolveResult``.

    ``feas_rest_num > 0`` appends Stage-II exact polish with the last
    learned rho (reference: main.py:1035-1064).  ``rollout_impl='fused'``
    runs the whole K-iteration rollout inside the Pallas megakernel
    (Q/A0/state VMEM-resident; TPU-only, bf16 profile) — the fastest
    serving path.  ``stage2_impl`` selects the polish backend: 'lu'
    (factor-once XLA, reference parity), 'cg' (matrix-free XLA), 'fused'
    (whole polish loop in one Pallas kernel with a factor-once explicit
    f32 inverse of the full saddle-point matrix, VMEM-resident — LU-route
    accuracy at explicit-inverse speed; kernels/stage2_kernel.py), or
    'fused-direct' (the kernel's condensed-system M⁻¹ ablation — smaller
    resident inverse, accuracy-limited at cond(M)).  The default 'auto'
    resolves to 'fused' on TPU and 'lu' elsewhere (the kernel has no
    CPU/GPU lowering).
    """
    if stage2_impl == "auto":
        stage2_impl = "fused" if jax.default_backend() == "tpu" else "lu"
    check_schedule_len(params, num_iters)
    if model_name == "lstm" and (use_pallas or matvec_mode):
        step_fn = make_lstm_step(use_pallas=use_pallas,
                                 gate_dtype=gate_dtype,
                                 matvec_mode=matvec_mode)
    else:
        step_fn = get_cell(model_name).step
    hc_dtype = jnp.bfloat16 if gate_dtype == "bfloat16" else jnp.float32

    @jax.jit
    def solve(data: QPBatch) -> SolveResult:
        B = data.p.shape[0]
        scaled, sc = scale_batch(data, iters=scaling_iters) \
            if scaling_iters else (data, None)
        if rollout_impl == "fused":
            from .kernels.rollout_kernel import fused_rollout
            x, y, z = fused_rollout(params, scaled, hidden=hidden_dim,
                                    K=num_iters, sigma=sigma)
            st = IterState(x=x, y=y, z=z,
                           xv=jnp.concatenate([x, y], -1),
                           H=jnp.zeros((B, 1, 1), hc_dtype),
                           C=jnp.zeros((B, 1, 1), hc_dtype))
        else:
            st = init_state(B, data.num_var, data.num_constr, hidden_dim,
                            dtype=data.p.dtype, hc_dtype=hc_dtype)
            st = rollout(step_fn, params, st, scaled, sigma, num_iters)
        if sc is not None:
            st = unscale_state(st, sc)
        if feas_rest_num:
            rho_vec, _ = _schedules(params, num_iters - 1, data.eq_mask)
            if stage2_impl in ("fused", "fused-direct"):
                from .kernels.stage2_kernel import fused_stage2
                st, _, _ = fused_stage2(
                    st, data, rho_vec, num_iters=feas_rest_num,
                    sigma=sigma,
                    solver="direct" if stage2_impl == "fused-direct"
                    else "kkt")
            elif stage2_impl == "cg":
                from .solvers.cg import feasibility_restoration_cg
                st = feasibility_restoration_cg(st, data, sigma, rho_vec,
                                                feas_rest_num)
            else:
                st = exact_mod.feasibility_restoration(
                    st, data, sigma, rho_vec, feas_rest_num)
        pr, dr = metrics.primal_dual_residual(
            st.x, st.y, st.z, data.Q, data.p, data.A0, "default")
        obj = metrics.obj_fn(st.x, data.Q, data.p, "default")
        return SolveResult(x=st.x, y=st.y, z=st.z, primal_res=pr,
                           dual_res=dr, obj=obj)

    return solve


def solve_qp_batch(data: QPBatch, params: Dict, *, hidden_dim: int,
                   num_iters: int, **kw) -> SolveResult:
    """One-shot convenience wrapper around :func:`make_solver`."""
    return make_solver(params, hidden_dim=hidden_dim,
                       num_iters=num_iters, **kw)(data)
