"""Modified Ruiz equilibration of the KKT matrix + cost normalization.

TPU-native re-design of the reference's ``Scaling`` class
(reference: methods/scaling.py:5-119).  Differences from the reference that
matter for performance, with identical numerics:

  * the scaling factors are kept as **vectors** ``d (B,n)``, ``e (B,m)``,
    ``cost (B,)`` instead of dense diagonal matrices, so each Ruiz sweep is
    elementwise broadcasting rather than two ``bmm`` per matrix
    (reference: methods/scaling.py:57-61, 80-88);
  * the whole routine is a pure function, ``jit``-able and ``vmap``-able,
    with the iteration count unrolled statically (default 10, the
    ``--scaling_ites`` knob, reference: main.py:33).

Semantics preserved exactly:
  * per-column infinity norms of the stacked KKT matrix ``[[Q, A0ᵀ],[A0, 0]]``
    (reference: methods/scaling.py:17-29);
  * clamp to [1e-4, 1e4] with clamped-to-MIN entries reset to 1.0
    (reference: methods/scaling.py:31-46);
  * per-sweep cost normalization by max(mean column norm of Q, ‖p‖_inf)
    (reference: methods/scaling.py:90-105).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..types import QPBatch, ScalingState

MIN_SCALING = 1e-4
MAX_SCALING = 1e4


def _limit_scaling(v: jnp.ndarray) -> jnp.ndarray:
    clamped = jnp.clip(v, MIN_SCALING, MAX_SCALING)
    return jnp.where(clamped == MIN_SCALING, 1.0, clamped)


def ruiz_scale(Q: jnp.ndarray, p: jnp.ndarray, A0: jnp.ndarray,
               zl: jnp.ndarray, zu: jnp.ndarray,
               iters: int = 10) -> Tuple[jnp.ndarray, jnp.ndarray,
                                         jnp.ndarray, jnp.ndarray,
                                         jnp.ndarray, ScalingState]:
    """Scale (Q, p, A0, zl, zu); return scaled data + ScalingState(d, e, cost).

    Shapes: Q (B,n,n), p (B,n), A0 (B,m,n), zl/zu (B,m).
    ``zl``/``zu`` may contain +-inf; scaling by a positive factor keeps them
    infinite, matching the reference's diagonal multiply.
    """
    B, n = p.shape
    m = A0.shape[-2]
    d = jnp.ones((B, n), Q.dtype)
    e = jnp.ones((B, m), Q.dtype)
    cost = jnp.ones((B,), Q.dtype)

    for _ in range(iters):
        # --- Ruiz step: 1/sqrt of KKT column norms ---
        norm_q_cols = jnp.max(jnp.abs(Q), axis=-2)    # (B, n) col norms of Q
        norm_a_cols = jnp.max(jnp.abs(A0), axis=-2)   # (B, n) col norms of A0
        first = jnp.maximum(norm_q_cols, norm_a_cols)
        second = jnp.max(jnp.abs(A0), axis=-1)        # (B, m) row norms of A0
        norms = _limit_scaling(jnp.concatenate([first, second], axis=-1))
        s = 1.0 / jnp.sqrt(norms)
        dt = s[:, :n]
        et = s[:, n:]

        Q = dt[:, :, None] * Q * dt[:, None, :]
        A0 = et[:, :, None] * A0 * dt[:, None, :]
        p = dt * p
        zl = et * zl
        zu = et * zu
        d = dt * d
        e = et * e

        # --- cost normalization step ---
        norm_q_mean = jnp.mean(jnp.max(jnp.abs(Q), axis=-2), axis=-1)  # (B,)
        inf_norm_p = _limit_scaling(jnp.max(jnp.abs(p), axis=-1))      # (B,)
        scale_cost = _limit_scaling(jnp.maximum(inf_norm_p, norm_q_mean))
        c_temp = 1.0 / scale_cost
        Q = c_temp[:, None, None] * Q
        p = c_temp[:, None] * p
        cost = c_temp * cost

    return Q, p, A0, zl, zu, ScalingState(d=d, e=e, cost=cost)


def scale_batch(data: QPBatch, iters: int = 10) -> Tuple[QPBatch, ScalingState]:
    """Scale a QPBatch in solver space; metric-only views stay unscaled
    (the reference also evaluates violations against the originals,
    reference: main.py:892-946)."""
    Q, p, A0, zl, zu, st = ruiz_scale(data.Q, data.p, data.A0,
                                      data.zl, data.zu, iters=iters)
    scaled = QPBatch(Q=Q, p=p, A0=A0, zl=zl, zu=zu, eq_mask=data.eq_mask,
                     G=data.G, c=data.c, A=data.A, b=data.b,
                     lb=data.lb, ub=data.ub)
    return scaled, st
