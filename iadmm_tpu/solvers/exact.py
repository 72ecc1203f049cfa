"""Stage-II exact ADMM step (feasibility restoration).

TPU equivalent of the reference's LU solver module
(reference: models/lu.py:4-47): the KKT matrix is materialized **once**,
LU-factorized with XLA's batched LU, and the factors are reused for every
polish step — mirroring the reference's (lu, piv) cache
(reference: models/lu.py:27-35).  Fixed relaxation alpha=1.6 with
z-relaxation enabled (reference: models/lu.py:24, 43), and the rho_vec is
whatever the *last learned iteration* produced (reference: main.py:882, 1061).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..types import IterState, QPBatch
from .step import admm_update, kkt_rhs

ALPHA_STAGE2 = 1.6


def build_kkt(data: QPBatch, sigma, rho_vec: jax.Array) -> jax.Array:
    """Ã = [[Q+σI, A0ᵀ], [A0, −diag(1/ρ)]] as a dense (B, n+m, n+m) batch.
    Only Stage II ever materializes this (reference: models/lu.py:28-29)."""
    B, n = data.p.shape
    m = data.num_constr
    eye_n = jnp.eye(n, dtype=data.Q.dtype)
    top = jnp.concatenate([data.Q + sigma * eye_n,
                           jnp.swapaxes(data.A0, -1, -2)], axis=-1)
    neg_inv_rho = -jnp.eye(m, dtype=data.Q.dtype) / rho_vec[:, :, None]
    bottom = jnp.concatenate([data.A0, neg_inv_rho], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def lu_factorize(data: QPBatch, sigma,
                 rho_vec: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Batched LU of the KKT matrix (factor once, reference: models/lu.py:31)."""
    K = build_kkt(data, sigma, rho_vec)
    lu, piv = jax.vmap(jax.scipy.linalg.lu_factor)(K)
    return lu, piv


def exact_step(lu: jax.Array, piv: jax.Array, rho_vec: jax.Array,
               state: IterState, data: QPBatch, sigma,
               alpha: float = ALPHA_STAGE2) -> IterState:
    """One exact OSQP-style iteration via cached LU factors
    (reference: models/lu.py:33-47)."""
    b1, b2 = kkt_rhs(data, state.x, state.y, state.z, sigma, rho_vec)
    rhs = jnp.concatenate([b1, b2], axis=-1)
    xv = jax.vmap(lambda l, p_, r: jax.scipy.linalg.lu_solve((l, p_), r))(
        lu, piv, rhs)
    x, y, z = admm_update(data, xv, state.x, state.y, state.z,
                          rho_vec, alpha, relax_z=True)
    return IterState(x=x, y=y, z=z, xv=xv, H=state.H, C=state.C)


def feasibility_restoration(state: IterState, data: QPBatch, sigma,
                            rho_vec: jax.Array, num_iters: int,
                            alpha: float = ALPHA_STAGE2) -> IterState:
    """Run ``num_iters`` exact polish steps with a single factorization,
    scanning on device (reference Stage-II loop: main.py:1054-1064)."""
    lu, piv = lu_factorize(data, sigma, rho_vec)

    def body(st, _):
        return exact_step(lu, piv, rho_vec, st, data, sigma, alpha), None

    final, _ = jax.lax.scan(body, state, None, length=num_iters)
    return final
