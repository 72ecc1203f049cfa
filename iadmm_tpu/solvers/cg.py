"""Matrix-free Stage-II solver: batched conjugate gradient on the
condensed KKT system.

The LU path (:mod:`iadmm_tpu.solvers.exact`) materializes and factors the
dense (n+m)² KKT matrix — O((n+m)²) memory per instance.  For large n this
CG path solves the equivalent *condensed* SPD system

    M x̃ = b,   M = Q + σI + A0ᵀ diag(ρ) A0
    b = σx − p + A0ᵀ(ρ∘z − y)
    ν = ρ∘(A0 x̃ − z) + y            (implied KKT dual block)

without ever forming M: each CG iteration is one Q matvec + two A0
matvecs.  All instances iterate in lockstep with per-instance step sizes
(a hand-rolled batched CG — jax.scipy's cg would couple the batch through
scalar dot products).  Jacobi (diagonal) preconditioning uses
diag(M) = diag(Q) + σ + Σ_k ρ_k A0[k,:]², cheap to form exactly.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..types import IterState, QPBatch
from .step import admm_update, bmv, bmv_t

ALPHA_STAGE2 = 1.6


def condensed_matvec(data: QPBatch, v: jax.Array, sigma,
                     rho_vec: jax.Array, mode=None) -> jax.Array:
    """M·v = Qv + σv + A0ᵀ(ρ∘(A0 v)) without materializing M."""
    return (bmv(data.Q, v, mode) + sigma * v
            + bmv_t(data.A0, rho_vec * bmv(data.A0, v, mode), mode))


def condensed_rhs(data: QPBatch, x, y, z, sigma, rho_vec) -> jax.Array:
    return sigma * x - data.p + bmv_t(data.A0, rho_vec * z - y)


def jacobi_diag(data: QPBatch, sigma, rho_vec) -> jax.Array:
    """diag(M) exactly: (B, n)."""
    qd = jnp.diagonal(data.Q, axis1=-2, axis2=-1)
    ad = jnp.einsum("bmn,bm->bn", data.A0 ** 2, rho_vec)
    return qd + sigma + ad


def batched_cg(matvec, b: jax.Array, x0: jax.Array, diag: jax.Array,
               maxiter: int, tol: float = 1e-8
               ) -> Tuple[jax.Array, jax.Array]:
    """Preconditioned CG over a batch with per-instance alpha/beta.

    Fixed ``maxiter`` scan (static shape for XLA); converged instances are
    masked and stop updating.  Returns (x, final residual norms).
    """
    def dot(a, c):
        return jnp.einsum("bi,bi->b", a, c)

    r = b - matvec(x0)
    zp = r / diag
    p = zp
    rz = dot(r, zp)
    bnorm = jnp.sqrt(dot(b, b)) + 1e-30

    def body(carry, _):
        x, r, p, rz = carry
        Ap = matvec(p)
        denom = dot(p, Ap)
        active = (jnp.sqrt(dot(r, r)) / bnorm > tol) & (denom > 0)
        alpha = jnp.where(active, rz / jnp.where(denom == 0, 1.0, denom),
                          0.0)
        x = x + alpha[:, None] * p
        r = r - alpha[:, None] * Ap
        zp = r / diag
        rz_new = dot(r, zp)
        beta = jnp.where(active, rz_new / jnp.where(rz == 0, 1.0, rz), 0.0)
        p = zp + beta[:, None] * p
        rz = jnp.where(active, rz_new, rz)
        return (x, r, p, rz), None

    (x, r, _, _), _ = jax.lax.scan(body, (x0, r, p, rz), None,
                                   length=maxiter)
    return x, jnp.sqrt(dot(r, r))


def exact_step_cg(rho_vec: jax.Array, state: IterState, data: QPBatch,
                  sigma, maxiter: int = 100, tol: float = 1e-8,
                  alpha: float = ALPHA_STAGE2) -> IterState:
    """One exact ADMM iteration with the KKT solve done by batched CG.
    Same update semantics as the LU Stage II (reference: models/lu.py:36-47);
    xv carries [x̃; ν] so downstream ls_res metrics keep working."""
    n = data.num_var
    b = condensed_rhs(data, state.x, state.y, state.z, sigma, rho_vec)
    diag = jacobi_diag(data, sigma, rho_vec)
    x_t, _ = batched_cg(
        lambda v: condensed_matvec(data, v, sigma, rho_vec),
        b, state.xv[:, :n], diag, maxiter, tol)
    nu = rho_vec * (bmv(data.A0, x_t) - state.z) + state.y
    xv = jnp.concatenate([x_t, nu], axis=-1)
    x, y, z = admm_update(data, xv, state.x, state.y, state.z, rho_vec,
                          alpha, relax_z=True)
    return IterState(x=x, y=y, z=z, xv=xv, H=state.H, C=state.C)


def feasibility_restoration_cg(state: IterState, data: QPBatch, sigma,
                               rho_vec: jax.Array, num_iters: int,
                               cg_iters: int = 100,
                               alpha: float = ALPHA_STAGE2) -> IterState:
    """Stage-II polish loop, matrix-free; CG warm-starts from the previous
    x̃ carried in xv."""

    def body(st, _):
        return exact_step_cg(rho_vec, st, data, sigma, cg_iters,
                             alpha=alpha), None

    final, _ = jax.lax.scan(body, state, None, length=num_iters)
    return final
