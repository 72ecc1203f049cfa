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
    """QP batch with BCOO Q and A0 (batched, shared padded nse).

    Exposes the three solver matvecs (``Qv``, ``Av``, ``ATv``) so the step /
    loss / metric functions below are format-agnostic — :class:`BSRQPBatch`
    implements the same protocol over tile-sparse Pallas matvecs."""

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

    def Qv(self, v: jax.Array) -> jax.Array:
        return _bmv(self.Q, v)

    def Av(self, v: jax.Array) -> jax.Array:
        return _bmv(self.A0, v)

    def ATv(self, v: jax.Array) -> jax.Array:
        return _bmv_t(self.A0, v)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BSRQPBatch:
    """QP batch with tile-sparse (BSR Pallas) Q / A0 / A0ᵀ.

    The TPU-native sparse route: unstructured BCOO gathers win nothing on
    TPU HBM traffic, but *tile-level* sparsity (banded / block / arrow
    constraint structure) cuts the streamed bytes by the tile-occupancy
    factor (kernels/sparse_matvec.py).  The transpose is stored as a second
    first-class BSR operand.  Selected via ``ExperimentConfig.sparse_format
    = 'bsr'``."""

    Q: "BSRMatrix"     # (B, n, n) tiles
    p: jax.Array
    A0: "BSRMatrix"    # (B, m, n) tiles
    A0T: "BSRMatrix"   # (B, n, m) tiles
    zl: jax.Array
    zu: jax.Array
    eq_mask: jax.Array
    interpret: bool = dataclasses.field(
        default=False, metadata=dict(static=True))

    @property
    def num_var(self) -> int:
        return self.Q.shape[-1]

    @property
    def num_constr(self) -> int:
        return self.A0.shape[0]

    # Autodiff flows through v (the iterate depends on the trained params);
    # each matvec carries its transpose operand for the VJP.  Q is symmetric
    # for every family (diag / MMᵀ+cI / factor model; Ruiz scaling D·Q·D
    # preserves symmetry), so Qᵀ@g = Q@g.
    def Qv(self, v: jax.Array) -> jax.Array:
        from .sparse_matvec import bsr_matvec_ad
        return bsr_matvec_ad(self.Q, self.Q, v, self.interpret)

    def Av(self, v: jax.Array) -> jax.Array:
        from .sparse_matvec import bsr_matvec_ad
        return bsr_matvec_ad(self.A0, self.A0T, v, self.interpret)

    def ATv(self, v: jax.Array) -> jax.Array:
        from .sparse_matvec import bsr_matvec_ad
        return bsr_matvec_ad(self.A0T, self.A0, v, self.interpret)


def from_dense(data: QPBatch, nse_pad: int = 1024, fmt: str = "bcoo",
               tile=(8, 128), dtype=None, interpret: bool = False):
    """Convert a dense QPBatch to the device-sparse layout.

    ``fmt='bcoo'``: batched BCOO; nse is the max over the batch, rounded up
    to a multiple of ``nse_pad`` so successive batches of the same family
    hit one compiled program instead of retracing per batch.
    ``fmt='bsr'``: padded tile-sparse BSR (kernels/sparse_matvec.py) with
    ``tile`` tiles; ``dtype`` sets the tile storage (bf16 halves the
    streamed bytes, pairing with the bf16 matvec profile)."""
    if fmt == "bsr":
        from .sparse_matvec import bsr_from_dense
        import jax.numpy as _jnp
        dt = dtype or _jnp.float32
        Qh = np.asarray(data.Q)
        Ah = np.asarray(data.A0)
        return BSRQPBatch(
            Q=bsr_from_dense(Qh, tile, dt),
            p=data.p,
            A0=bsr_from_dense(Ah, tile, dt),
            A0T=bsr_from_dense(Ah.transpose(0, 2, 1), tile, dt),
            zl=data.zl, zu=data.zu, eq_mask=data.eq_mask,
            interpret=interpret)
    if fmt != "bcoo":
        raise ValueError(f"unknown sparse format {fmt!r}")

    def to_bcoo(M):
        nse = int(np.max(np.sum(np.asarray(M) != 0, axis=(-2, -1))))
        nse = max(((nse + nse_pad - 1) // nse_pad) * nse_pad, 1)
        nse = min(nse, M.shape[-2] * M.shape[-1])
        return jsparse.BCOO.fromdense(M, nse=nse, n_batch=1)

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


def kkt_feature_sparse(data, xv, x, y, z, sigma, rho_vec):
    """g = Ãᵀ(Ã·xv − b̃) with all Q/A0 products sparse
    (dense blockwise algebra: iadmm_tpu/solvers/step.py).  ``data`` is any
    batch exposing the Qv/Av/ATv matvec protocol (BCOO or BSR)."""
    n = data.num_var
    u, nu = xv[:, :n], xv[:, n:]
    r1 = data.Qv(u) + sigma * u + data.ATv(nu) \
        - (sigma * x - data.p)
    r2 = data.Av(u) - nu / rho_vec - (z - y / rho_vec)
    g1 = data.Qv(r1) + sigma * r1 + data.ATv(r2)
    g2 = data.Av(r1) - r2 / rho_vec
    return jnp.concatenate([g1, g2], axis=-1)


def sparse_lstm_step(params, t, state: IterState, data,
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


def primal_dual_residual_sparse(x, y, z, data):
    """(‖A0x − z‖₂, ‖Qx + p + A0ᵀy‖₂) with sparse matvecs
    (dense version: evaluation/metrics.py; reference: utils.py:68-71)."""
    pr = jnp.linalg.norm(data.Av(x) - z, axis=-1)
    dr = jnp.linalg.norm(data.Qv(x) + data.p + data.ATv(y),
                         axis=-1)
    return pr, dr


def chunk_loss_sparse(params, state: IterState, data, sigma,
                      chunk_len: int, outer_T: int, t0, remat: bool = False):
    """TBPTT chunk objective over sparse problem data — drop-in for
    ``rollouts.chunk_loss`` via the harness ``loss_fn`` hook."""

    def body(st, t):
        st = sparse_lstm_step(params, t, st, data, sigma)
        pr, dr = primal_dual_residual_sparse(st.x, st.y, st.z, data)
        return st, (pr + dr).mean()

    if remat:
        body = jax.checkpoint(body)
    ts = t0 + jnp.arange(chunk_len)
    final, losses = jax.lax.scan(body, state, ts)
    return losses.sum() / outer_T, final


def eval_rollout_sparse(params, state: IterState, data_sp,
                        data_orig: QPBatch, scaling, sigma, num_iters: int,
                        metrics_mode: str = "default"):
    """Test rollout with per-iteration metrics, solver matvecs sparse.

    The solver path (KKT feature + ADMM update) runs on the scaled sparse
    data; the reported metrics follow the reference protocol — original
    (unscaled) space against the dense pre-scaling data
    (reference: main.py:892-978) — and the scaled-space linear-system
    residual ‖Ã·xv_new − b̃_old‖ is computed with sparse matvecs."""
    from ..solvers.rollouts import EvalTrace, _unscale
    from ..evaluation import metrics

    n = data_sp.num_var

    def body(st, t):
        rho_vec, _ = _schedules(params, t, data_sp.eq_mask)
        old = st
        st = sparse_lstm_step(params, t, st, data_sp, sigma)
        u, nu = st.xv[:, :n], st.xv[:, n:]
        r1 = data_sp.Qv(u) + sigma * u + data_sp.ATv(nu) \
            - (sigma * old.x - data_sp.p)
        r2 = data_sp.Av(u) - nu / rho_vec \
            - (old.z - old.y / rho_vec)
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

    ts = jnp.arange(num_iters)
    final, ys = jax.lax.scan(body, state, ts)
    trace = EvalTrace(obj=ys["obj"], primal_res=ys["primal_res"],
                      dual_res=ys["dual_res"], ls_res=ys["ls"],
                      violations=ys["vio"])
    return final, trace
