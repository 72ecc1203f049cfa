"""One learned inexact-ADMM iteration, TPU-first.

The reference materializes the full ``(n+m)²`` KKT matrix Ã **every step**
and runs two dense (n+m)² matvecs through it
(reference: models/lstm.py:67-72).  Here Ã is never formed: the LSTM input
feature ``g = Ãᵀ(Ã·xv − b̃)`` is computed blockwise from ``Q``/``A0``
matvecs with the σI and diag(1/ρ) terms fused in.  Per step this reads Q
once and A0 twice per pass (2 passes) instead of building and streaming an
(n+m)² matrix — the single biggest data-movement win over the reference
design (SURVEY.md §3.3).

Block algebra, with ``xv = [u; ν]`` (u ∈ Rⁿ, ν ∈ Rᵐ):

    Ã  = [[Q + σI, A0ᵀ], [A0, -diag(1/ρ)]]          (symmetric)
    b̃  = [σx − p ; z − y/ρ]
    r  = Ã·xv − b̃ = [Qu + σu + A0ᵀν − (σx − p);
                     A0u − ν/ρ − (z − y/ρ)]
    g  = Ã·r       = [Qr₁ + σr₁ + A0ᵀr₂ ; A0r₁ − r₂/ρ]
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..types import IterState, QPBatch
from . import cells

RHO_EQ_OVER_RHO_INEQ = 1e3  # reference: models/lstm.py:18

# Matmul precision for the KKT matvecs (numerically sensitive path).
MATVEC_PRECISION = jax.lax.Precision.HIGHEST


def _matvec_cast(M, v, mode: Optional[str]):
    """Returns (M, v, precision, preferred_element_type) for the mode."""
    if mode == "bf16":
        return (M.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
                jax.lax.Precision.DEFAULT, jnp.float32)
    if mode == "default":
        return M, v, jax.lax.Precision.DEFAULT, None
    return M, v, MATVEC_PRECISION, None


def bmv(M: jax.Array, v: jax.Array, mode: Optional[str] = None) -> jax.Array:
    """Batched matvec: (B,i,j),(B,j)->(B,i).

    A 2-D ``M`` is diagonal storage — ``(B, n)`` holding diag(M) — and the
    matvec is an elementwise VPU product (the harness preloads diagonal-Q
    families this way: n² → n resident bytes and traffic per instance).

    ``mode``: None/'highest' = native-dtype HIGHEST (torch-parity numerics),
    'default' = one-pass TPU f32, 'bf16' = bf16 operands + f32 accumulate
    (fast inference profile — halves HBM traffic of the KKT matvecs).
    """
    if M.ndim == 2:
        return M.astype(v.dtype) * v
    M, v, prec, pet = _matvec_cast(M, v, mode)
    return jnp.einsum("bij,bj->bi", M, v, precision=prec,
                      preferred_element_type=pet)


def bmv_t(M: jax.Array, v: jax.Array, mode: Optional[str] = None) -> jax.Array:
    """Batched transposed matvec: (B,i,j),(B,i)->(B,j)."""
    if M.ndim == 2:            # diagonal storage: symmetric
        return M.astype(v.dtype) * v
    M, v, prec, pet = _matvec_cast(M, v, mode)
    return jnp.einsum("bij,bi->bj", M, v, precision=prec,
                      preferred_element_type=pet)


def rho_vector(rho: jax.Array, eq_mask: jax.Array) -> jax.Array:
    """Per-row penalty: equality rows get 1e3x rho
    (reference: models/lstm.py:60-62).  rho may be scalar or (B,)."""
    rho = jnp.asarray(rho)
    if rho.ndim == 1:
        rho = rho[:, None]
    return rho * jnp.where(eq_mask, RHO_EQ_OVER_RHO_INEQ, 1.0)


def kkt_rhs(data: QPBatch, x, y, z, sigma, rho_vec):
    """b̃ = [σx − p ; z − y/ρ] (reference: models/lstm.py:69)."""
    return sigma * x - data.p, z - y / rho_vec


def kkt_matvec(data: QPBatch, u: jax.Array, nu: jax.Array, sigma,
               rho_vec, mode: Optional[str] = None
               ) -> Tuple[jax.Array, jax.Array]:
    """(top, bottom) blocks of Ã·[u; ν] without materializing Ã."""
    top = bmv(data.Q, u, mode) + sigma * u + bmv_t(data.A0, nu, mode)
    bottom = bmv(data.A0, u, mode) - nu / rho_vec
    return top, bottom


def kkt_residual(data: QPBatch, xv, x, y, z, sigma, rho_vec,
                 mode: Optional[str] = None):
    """r = Ã·xv − b̃, blockwise."""
    n = data.num_var
    u, nu = xv[:, :n], xv[:, n:]
    t, btm = kkt_matvec(data, u, nu, sigma, rho_vec, mode)
    b1, b2 = kkt_rhs(data, x, y, z, sigma, rho_vec)
    return t - b1, btm - b2


def kkt_feature(data: QPBatch, xv, x, y, z, sigma, rho_vec,
                mode: Optional[str] = None) -> jax.Array:
    """g = Ãᵀ(Ã·xv − b̃); Ã is symmetric so Ãᵀ = Ã (Q symmetric)."""
    r1, r2 = kkt_residual(data, xv, x, y, z, sigma, rho_vec, mode)
    g1, g2 = kkt_matvec(data, r1, r2, sigma, rho_vec, mode)
    return jnp.concatenate([g1, g2], axis=-1)


def admm_update(data: QPBatch, xv_new, x, y, z, rho_vec, alpha,
                relax_z: bool):
    """OSQP-style x/z/y updates after the (in)exact KKT solve.

    ``relax_z=False`` reproduces the learned step's disabled z-relaxation
    (reference: models/lstm.py:91-92); ``True`` the exact Stage-II step
    (reference: models/lu.py:43).
    """
    n = data.num_var
    x_t, v = xv_new[:, :n], xv_new[:, n:]
    z_t = z + (v - y) / rho_vec
    x_new = alpha * x_t + (1.0 - alpha) * x
    z_temp = alpha * z_t + (1.0 - alpha) * z if relax_z else z_t
    z_new = jnp.maximum(jnp.minimum(z_temp + y / rho_vec, data.zu), data.zl)
    y_new = y + rho_vec * (z_temp - z_new)
    return x_new, y_new, z_new


# ---------------------------------------------------------------------------
# Per-variant steps.  Signature: step(params, t, state, data, sigma) -> state
# ---------------------------------------------------------------------------

def _schedules(params: Dict, t, eq_mask, fixed_alpha: float = 1.6):
    rho = jax.nn.sigmoid(params["rho"][t]) if "rho" in params else jnp.float32(0.1)
    rho_vec = rho * jnp.where(eq_mask, RHO_EQ_OVER_RHO_INEQ, 1.0)
    if "alpha" in params:
        alpha = 2.0 * jax.nn.sigmoid(params["alpha"][t])
    else:
        alpha = jnp.asarray(fixed_alpha, rho_vec.dtype)
    return rho_vec, alpha


def _cell_step(cell_apply: Callable, params, t, state: IterState,
               data: QPBatch, sigma,
               matvec_mode: Optional[str] = None) -> IterState:
    rho_vec, alpha = _schedules(params, t, data.eq_mask)
    g = kkt_feature(data, state.xv, state.x, state.y, state.z, sigma,
                    rho_vec, matvec_mode)
    inputs = jnp.stack([state.xv, g], axis=-1)  # (B, n+m, 2)
    delta, H, C = cell_apply(params, inputs, state.H, state.C)
    xv = state.xv - delta
    x, y, z = admm_update(data, xv, state.x, state.y, state.z,
                          rho_vec, alpha, relax_z=False)
    return IterState(x=x, y=y, z=z, xv=xv, H=H, C=C)


def lstm_step(params, t, state, data, sigma) -> IterState:
    """Live-model parity step (reference: models/lstm.py:47-96)."""
    return _cell_step(cells.lstm_apply, params, t, state, data, sigma)


def gru_step(params, t, state, data, sigma) -> IterState:
    """Ghost GRU variant (models/gru.py)."""
    return _cell_step(cells.gru_apply, params, t, state, data, sigma)


def safeguard_lstm_step(params, t, state, data, sigma) -> IterState:
    """Ghost no-alpha ablation: learned rho, fixed alpha=1.6
    (models/safeguard_lstm_no_alpha.py)."""
    return _cell_step(cells.lstm_apply, params, t, state, data, sigma)


def multi_layer_lstm_step(params, t, state, data, sigma,
                          inner_T: int = 5) -> IterState:
    """Ghost multi-layer variant: ``inner_T`` shared-weight LSTM refinements
    of xv per ADMM iteration, fixed schedules (models/muti_layer_lstm.py)."""
    rho_vec, alpha = _schedules(params, t, data.eq_mask)
    xv, H, C = state.xv, state.H, state.C

    def inner(carry, _):
        xv, H, C = carry
        g = kkt_feature(data, xv, state.x, state.y, state.z, sigma, rho_vec)
        inputs = jnp.stack([xv, g], axis=-1)
        delta, H, C = cells.lstm_apply(params, inputs, H, C)
        return (xv - delta, H, C), None

    (xv, H, C), _ = jax.lax.scan(inner, (xv, H, C), None, length=inner_T)
    x, y, z = admm_update(data, xv, state.x, state.y, state.z,
                          rho_vec, alpha, relax_z=False)
    return IterState(x=x, y=y, z=z, xv=xv, H=H, C=C)


def gd_step(params, t, state, data, sigma) -> IterState:
    """Ghost non-learned baseline: plain gradient step on the KKT residual,
    xv ← xv − lr·Ãᵀ(Ã·xv − b̃) (models/gradient_descent.py)."""
    rho_vec, alpha = _schedules(params, t, data.eq_mask)
    g = kkt_feature(data, state.xv, state.x, state.y, state.z, sigma, rho_vec)
    lr = params.get("lr", jnp.float32(1e-3))
    xv = state.xv - lr * g
    x, y, z = admm_update(data, xv, state.x, state.y, state.z,
                          rho_vec, alpha, relax_z=False)
    return IterState(x=x, y=y, z=z, xv=xv, H=state.H, C=state.C)


def indirect_system(data: QPBatch, x, y, z, sigma, rho_vec):
    """The reduced (normal-equation) system of the indirect variant:
    ``(matvec_M, rhs)`` with  M = Q + σI + A0ᵀdiag(ρ)A0  and
    rhs = σx − p + A0ᵀ(ρ∘z − y).

    This is exactly the Schur complement of the direct KKT system
    (models/lstm.py:67-69): eliminating ν from
    ``[[Q+σI, A0ᵀ], [A0, −diag(1/ρ)]]·[x̃;ν] = [σx−p; z−y/ρ]`` via
    ν = ρ∘(A0x̃ − z) + y gives  M x̃ = rhs, and the direct z̃-update
    z + (ν−y)/ρ collapses to A0·x̃ — the property test
    (tests/test_step_equivalence.py) pins the reconstruction to this
    identity instead of the deleted reference source."""

    def matvec_M(v):
        return (bmv(data.Q, v) + sigma * v
                + bmv_t(data.A0, rho_vec * bmv(data.A0, v)))

    rhs = sigma * x - data.p + bmv_t(data.A0, rho_vec * z - y)
    return matvec_M, rhs


def indirect_lstm_step(params, t, state, data, sigma) -> IterState:
    """Ghost indirect variant: LSTM over the n variable tokens of the reduced
    (normal-equation) system  M x̃ = rhs  (see :func:`indirect_system`)
    (models/indirect_lstm.py; behavioural reconstruction from bytecode).
    State convention: ``xv[:, :n]`` carries x̃; H/C are sized (B, n+m, h) for
    harness uniformity but only the first n tokens are used.
    """
    n = data.num_var
    rho_vec, alpha = _schedules(params, t, data.eq_mask)
    x_t = state.xv[:, :n]
    matvec_M, rhs = indirect_system(data, state.x, state.y, state.z,
                                    sigma, rho_vec)
    r = matvec_M(x_t) - rhs
    g = matvec_M(r)
    inputs = jnp.stack([x_t, g], axis=-1)
    delta, Hn, Cn = cells.lstm_apply(params, inputs,
                                     state.H[:, :n], state.C[:, :n])
    x_t = x_t - delta
    z_t = bmv(data.A0, x_t)
    x_new = alpha * x_t + (1.0 - alpha) * state.x
    z_temp = z_t
    z_new = jnp.maximum(jnp.minimum(z_temp + state.y / rho_vec, data.zu),
                        data.zl)
    y_new = state.y + rho_vec * (z_temp - z_new)
    xv = state.xv.at[:, :n].set(x_t)
    H = state.H.at[:, :n].set(Hn)
    C = state.C.at[:, :n].set(Cn)
    return IterState(x=x_new, y=y_new, z=z_new, xv=xv, H=H, C=C)


def make_lstm_step(use_pallas: bool = False, gate_dtype: str = "float32",
                   matvec_mode: Optional[str] = None):
    """LSTM step factory selecting the cell backend and precision profile.

    ``use_pallas`` routes the token cell through the fused Pallas kernel
    (:mod:`iadmm_tpu.kernels.lstm_cell`); ``gate_dtype='bfloat16'`` runs the
    gate matmuls in bf16 on the MXU with f32 accumulation (TPU fast path);
    ``matvec_mode`` sets the KKT-feature matvec precision (see :func:`bmv`).
    """
    if not use_pallas and matvec_mode is None:
        return lstm_step
    if use_pallas:
        from ..kernels.lstm_cell import make_pallas_lstm_apply
        apply = make_pallas_lstm_apply(gate_dtype)
    else:
        apply = cells.lstm_apply

    def step(params, t, state, data, sigma):
        return _cell_step(apply, params, t, state, data, sigma,
                          matvec_mode=matvec_mode)

    return step


@dataclasses.dataclass(frozen=True)
class SolverCellSpec:
    """Registry entry: init + step for one solver-cell variant."""
    name: str
    init: Callable
    step: Callable
    input_dim: int = 2


CELL_REGISTRY: Dict[str, SolverCellSpec] = {
    "lstm": SolverCellSpec("lstm", cells.lstm_init, lstm_step),
    "gru": SolverCellSpec("gru", cells.gru_init, gru_step),
    "safeguard_lstm": SolverCellSpec(
        "safeguard_lstm", cells.safeguard_lstm_init, safeguard_lstm_step),
    "multi_layer_lstm": SolverCellSpec(
        "multi_layer_lstm",
        lambda key, input_dim, hidden_dim, length, **kw:
            cells.multi_layer_lstm_init(key, input_dim, hidden_dim,
                                        kw.get("inner_T", 5)),
        multi_layer_lstm_step),
    "gd": SolverCellSpec(
        "gd",
        lambda key, input_dim, hidden_dim, length, **kw:
            {"lr": jnp.float32(kw.get("lr", 1e-3)),
             "rho": 0.01 * jax.random.normal(key, (length,)),
             "alpha": 0.01 * jax.random.normal(
                 jax.random.fold_in(key, 1), (length,))},
        gd_step),
    "indirect_lstm": SolverCellSpec(
        "indirect_lstm", cells.lstm_init, indirect_lstm_step),
}


def check_schedule_len(params: Dict, num_iters: int) -> None:
    """Fail fast when a rollout asks for more iterations than the learned
    per-iteration schedules cover.  JAX's out-of-bounds gather semantics
    would otherwise silently clamp ``params['rho'][t]`` to the last entry
    (the reference raises an IndexError here); a misconfigured
    ``test_outer_T > outer_T`` must be an error, not a silent reuse of the
    final learned schedule."""
    for k in ("rho", "alpha"):
        if k in params and len(params[k]) < num_iters:
            raise ValueError(
                f"schedule params[{k!r}] has length {len(params[k])} but the "
                f"rollout needs {num_iters} iterations (test_outer_T must "
                f"not exceed the trained outer_T)")


def get_cell(name: str) -> SolverCellSpec:
    key = name.lower()
    if key not in CELL_REGISTRY:
        raise ValueError(f"unknown solver cell {name!r}; "
                         f"available: {sorted(CELL_REGISTRY)}")
    return CELL_REGISTRY[key]
