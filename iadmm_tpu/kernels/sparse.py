"""Sparse problem-data path for the sparse-A QP families.

The reference stores Random_QP / Equality_QP / SVM constraint matrices as
scipy CSC and densifies them at load time (reference: generate_data.py:119-128,
main.py:243-245), so its compute path is always dense.  Here sparse problem
data stays sparse on device as batched ``jax.experimental.sparse.BCOO``
(one shared nse budget per batch, padded — static shapes for XLA), and the
KKT feature / ADMM updates run on sparse matvecs.

On TPU, dense batched matvecs beat unstructured-sparse ones unless density
is low (the reference families are 40-60% dense); the sparse path is for
genuinely sparse workloads (BASELINE.json configs[3]) and for memory-bound
scaling in n, where A0 in BCOO form cuts HBM traffic by the density factor.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import sparse as jsparse

from ..types import IterState, QPBatch
from ..solvers import cells
from ..solvers.step import _schedules, admm_update


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SparseQPBatch:
    """QP batch with BCOO Q and A0 (batched, shared padded nse)."""

    Q: jsparse.BCOO    # (B, n, n)
    p: jax.Array       # (B, n)
    A0: jsparse.BCOO   # (B, m, n)
    zl: jax.Array
    zu: jax.Array
    eq_mask: jax.Array

    @property
    def num_var(self) -> int:
        return self.Q.shape[-1]

    @property
    def num_constr(self) -> int:
        return self.A0.shape[-2]


def from_dense(data: QPBatch) -> SparseQPBatch:
    """Convert a dense QPBatch; nse is the max over the batch (padded)."""
    def to_bcoo(M):
        nse = int(np.max(np.sum(np.asarray(M) != 0, axis=(-2, -1))))
        return jsparse.BCOO.fromdense(M, nse=max(nse, 1), n_batch=1)

    return SparseQPBatch(Q=to_bcoo(data.Q), p=data.p, A0=to_bcoo(data.A0),
                         zl=data.zl, zu=data.zu, eq_mask=data.eq_mask)


def _bmv(M: jsparse.BCOO, v: jax.Array) -> jax.Array:
    """Batched sparse matvec (B,i,j)·(B,j)->(B,i)."""
    return jsparse.bcoo_dot_general(
        M, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))))


def _bmv_t(M: jsparse.BCOO, v: jax.Array) -> jax.Array:
    """Batched transposed sparse matvec (B,i,j)·(B,i)->(B,j)."""
    return jsparse.bcoo_dot_general(
        M, v, dimension_numbers=(((1,), (1,)), ((0,), (0,))))


def kkt_feature_sparse(data: SparseQPBatch, xv, x, y, z, sigma, rho_vec):
    """g = Ãᵀ(Ã·xv − b̃) with all Q/A0 products sparse
    (dense blockwise algebra: iadmm_tpu/solvers/step.py)."""
    n = data.num_var
    u, nu = xv[:, :n], xv[:, n:]
    r1 = _bmv(data.Q, u) + sigma * u + _bmv_t(data.A0, nu) \
        - (sigma * x - data.p)
    r2 = _bmv(data.A0, u) - nu / rho_vec - (z - y / rho_vec)
    g1 = _bmv(data.Q, r1) + sigma * r1 + _bmv_t(data.A0, r2)
    g2 = _bmv(data.A0, r1) - r2 / rho_vec
    return jnp.concatenate([g1, g2], axis=-1)


def sparse_lstm_step(params, t, state: IterState, data: SparseQPBatch,
                     sigma) -> IterState:
    """Learned LSTM step over sparse problem data (same numerics as
    :func:`iadmm_tpu.solvers.step.lstm_step`)."""
    rho_vec, alpha = _schedules(params, t, data.eq_mask)
    g = kkt_feature_sparse(data, state.xv, state.x, state.y, state.z,
                           sigma, rho_vec)
    inputs = jnp.stack([state.xv, g], axis=-1)
    delta, H, C = cells.lstm_apply(params, inputs, state.H, state.C)
    xv = state.xv - delta
    x, y, z = admm_update(data, xv, state.x, state.y, state.z,
                          rho_vec, alpha, relax_z=False)
    return IterState(x=x, y=y, z=z, xv=xv, H=H, C=C)
