"""Core pytree types for the TPU-native inexact-ADMM QP framework.

The reference (NetSysOpt/I-ADMM-LSTM) carries problem data as a loose bag of
``torch.Tensor`` kwargs threaded through ``LSTM.forward``
(reference: models/lstm.py:47-58) and iterate state as six separate tensors
zero-initialised in the harness (reference: main.py:328-334).  Here both are
first-class JAX pytrees so they can be ``jit``/``vmap``/``scan``-carried and
sharded with ``jax.sharding`` without any marshalling code.

Shape conventions (differ from the reference's trailing singleton dim):
  * vectors are ``(B, k)``, not ``(B, k, 1)``
  * ``Q`` is the **doubled** Hessian, i.e. the objective is
    ``0.5 xᵀQx + pᵀx`` exactly as the reference evaluates it after its
    ``Q*2`` load-time convention (reference: main.py:298, utils.py:53-54).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class QPBatch:
    """A batch of dense QP instances in OSQP form.

    minimize    0.5 xᵀ Q x + pᵀ x
    subject to  zl <= A0 x <= zu

    Equality rows are encoded as ``zl == zu`` (finite); pure inequality rows
    have ``zl = -inf`` and/or ``zu = +inf``.  ``eq_mask`` marks equality rows
    and drives the RHO_EQ_OVER_RHO_INEQ=1e3 penalty split the reference applies
    by static row index (reference: models/lstm.py:18, 60-62); deriving it
    from ``zl == zu`` is equivalent for every reference problem family.

    Metric-only fields (``G, c, A, b, lb, ub``) feed per-constraint-class
    violation reports (reference: utils.py:56-66) and are never read by the
    solver itself.
    """

    Q: Array   # (B, n, n) doubled Hessian
    p: Array   # (B, n)
    A0: Array  # (B, m, n)
    zl: Array  # (B, m)
    zu: Array  # (B, m)
    eq_mask: Array  # (B, m) bool
    # Metric-only constraint views (optional).
    G: Optional[Array] = None   # (B, mi, n)
    c: Optional[Array] = None   # (B, mi)
    A: Optional[Array] = None   # (B, me, n)
    b: Optional[Array] = None   # (B, me)
    lb: Optional[Array] = None  # (B, n)
    ub: Optional[Array] = None  # (B, n)

    @property
    def batch(self) -> int:
        return self.Q.shape[0]

    @property
    def num_var(self) -> int:
        return self.Q.shape[-1]

    @property
    def num_constr(self) -> int:
        return self.A0.shape[-2]


def make_eq_mask(zl: jnp.ndarray, zu: jnp.ndarray) -> jnp.ndarray:
    """Equality rows are exactly the rows with ``zl == zu`` (both finite)."""
    return (zl == zu) & jnp.isfinite(zl)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class IterState:
    """ADMM + recurrent-cell iterate state, zero-initialised per rollout.

    Mirrors the six tensors the reference harness allocates
    (reference: main.py:328-334): primal ``x``, dual ``y``, auxiliary ``z``,
    stacked KKT iterate ``xv = [x̃; ν]``, and the cell's hidden/cell states
    ``H, C`` over the ``n+m`` "token" axis.
    """

    x: Array   # (B, n)
    y: Array   # (B, m)
    z: Array   # (B, m)
    xv: Array  # (B, n+m)
    H: Array   # (B, n+m, h) or (B, L, n+m, h) for multi-layer cells
    C: Array   # same shape as H


def init_state(batch: int, num_var: int, num_constr: int, hidden_dim: int,
               dtype=jnp.float32, num_layers: int = 0,
               hc_dtype=None) -> IterState:
    """Zero state matching reference main.py:328-334.

    ``num_layers=0`` gives the single-cell layout ``(B, n+m, h)``; ``>=1``
    stacks a leading layer axis for multi-layer cells.  ``hc_dtype``
    (default: ``dtype``) sets the recurrent-carry dtype — ``bfloat16``
    halves the dominant HBM traffic of a rollout on the Pallas fast path.
    """
    nm = num_var + num_constr
    hshape = (batch, nm, hidden_dim) if num_layers == 0 else (
        batch, num_layers, nm, hidden_dim)
    hc = dtype if hc_dtype is None else hc_dtype
    return IterState(
        x=jnp.zeros((batch, num_var), dtype),
        y=jnp.zeros((batch, num_constr), dtype),
        z=jnp.zeros((batch, num_constr), dtype),
        xv=jnp.zeros((batch, nm), dtype),
        H=jnp.zeros(hshape, hc),
        C=jnp.zeros(hshape, hc),
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ScalingState:
    """Ruiz equilibration factors, kept as *vectors* (the reference stores
    dense diagonal matrices and pays bmm for every (un)scaling,
    reference: methods/scaling.py:57-61, 107-117).

    Unscale maps: ``x_orig = d * x``, ``z_orig = z / e``,
    ``y_orig = (e / cost) * y`` (reference: main.py:875-878).
    """

    d: Array     # (B, n)
    e: Array     # (B, m)
    cost: Array  # (B,)

    def unscale_x(self, x: Array) -> Array:
        return self.d * x

    def unscale_z(self, z: Array) -> Array:
        return z / self.e

    def unscale_y(self, y: Array) -> Array:
        return (self.e / self.cost[:, None]) * y
