"""Residuals, objective, and per-constraint-class violation metrics.

JAX ports of the reference metric functions (reference: utils.py:53-71) over
``(B, k)``-shaped vectors.  The reference's buggy-and-unused ``aug_lagr``
(``bmm(Q, p)`` typo, reference: utils.py:74-78) is implemented here with the
fix (Q·x), since the only call sites were commented-out theory checks
(reference: main.py:905-944).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..types import QPBatch
from ..solvers.step import bmv, bmv_t


def obj_fn(x: jax.Array, Q: jax.Array, p: jax.Array,
           mode: str = None) -> jax.Array:
    """0.5 xᵀQx + pᵀx per instance (Q is the doubled Hessian,
    reference: utils.py:53-54).  ``mode`` selects the matvec precision
    (see solvers.step.bmv); reporting paths use 'default'."""
    return 0.5 * jnp.einsum("bi,bi->b", x, bmv(Q, x, mode)) + \
        jnp.einsum("bi,bi->b", p, x)


def primal_dual_residual(x, y, z, Q, p, A0,
                         mode: str = None) -> Tuple[jax.Array, jax.Array]:
    """(‖A0x − z‖₂, ‖Qx + p + A0ᵀy‖₂) per instance
    (reference: utils.py:68-71)."""
    pr = jnp.linalg.norm(bmv(A0, x, mode) - z, axis=-1)
    dr = jnp.linalg.norm(bmv(Q, x, mode) + p + bmv_t(A0, y, mode), axis=-1)
    return pr, dr


def primal_dual_loss(x, y, z, data: QPBatch):
    """Unsupervised training loss: primal + dual residual per instance."""
    pr, dr = primal_dual_residual(x, y, z, data.Q, data.p, data.A0)
    return pr, dr, pr + dr


def ineq_dist(x, G, c, mode: str = None):
    """relu(Gx − c) (reference: utils.py:56-57)."""
    return jnp.maximum(bmv(G, x, mode) - c, 0.0)


def eq_dist(x, A, b, mode: str = None):
    """|b − Ax| (reference: utils.py:59-60)."""
    return jnp.abs(b - bmv(A, x, mode))


def lb_dist(x, lb):
    return jnp.maximum(lb - x, 0.0)


def ub_dist(x, ub):
    return jnp.maximum(x - ub, 0.0)


def violation_stats(x: jax.Array, data: QPBatch, mode: str = None):
    """Dict of (max-over-rows mean-over-batch, mean) per constraint class,
    mirroring the reference's per-epoch report (reference: main.py:367-379).
    Only classes present in the problem family appear."""
    out = {}
    if data.G is not None:
        d = ineq_dist(x, data.G, data.c, mode)
        out["ineq_max"] = d.max(axis=-1).mean()
        out["ineq_mean"] = d.mean()
    if data.A is not None:
        d = eq_dist(x, data.A, data.b, mode)
        out["eq_max"] = d.max(axis=-1).mean()
        out["eq_mean"] = d.mean()
    if data.lb is not None:
        d = lb_dist(x, data.lb)
        out["lb_max"] = d.max(axis=-1).mean()
        out["lb_mean"] = d.mean()
    if data.ub is not None:
        d = ub_dist(x, data.ub)
        out["ub_max"] = d.max(axis=-1).mean()
        out["ub_mean"] = d.mean()
    return out


def aug_lagr(x, z, y, Q, p, A0, rho_vec):
    """Augmented Lagrangian (reference: utils.py:74-78, with the Q·p typo
    fixed to Q·x)."""
    fx = 0.5 * jnp.einsum("bi,bi->b", x, bmv(Q, x)) + \
        jnp.einsum("bi,bi->b", p, x)
    res = bmv(A0, x) - z
    dual_item = jnp.einsum("bi,bi->b", y, res)
    aug_item = 0.5 * jnp.einsum("bi,bi->b", res, rho_vec * res)
    return fx + dual_item + aug_item
