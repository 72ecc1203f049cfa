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
               tile=(8, 128), dtype=None, interpret: bool = False,
               min_k=(0, 0, 0), min_nse=(0, 0)):
    """Convert a dense QPBatch to the device-sparse layout.

    ``fmt='bcoo'``: batched BCOO; nse is the max over the batch, rounded up
    to a multiple of ``nse_pad`` so successive batches of the same family
    hit one compiled program instead of retracing per batch.
    ``fmt='bsr'``: padded tile-sparse BSR (kernels/sparse_matvec.py) with
    ``tile`` tiles; ``dtype`` sets the tile storage (bf16 halves the
    streamed bytes, pairing with the bf16 matvec profile).

    ``min_k`` (Q, A0, A0T) / ``min_nse`` (Q, A0) floor the padded tile count
    / nse so a caller converting many batches of one family (the train-split
    sparse cache, train/sparse_preload.py) can pin every batch to one
    compiled program shape."""
    if fmt == "bsr":
        from .sparse_matvec import bsr_from_dense
        import jax.numpy as _jnp
        dt = dtype or _jnp.float32
        Qh = np.asarray(data.Q)
        Ah = np.asarray(data.A0)
        return BSRQPBatch(
            Q=bsr_from_dense(Qh, tile, dt, min_k=min_k[0]),
            p=data.p,
            A0=bsr_from_dense(Ah, tile, dt, min_k=min_k[1]),
            A0T=bsr_from_dense(Ah.transpose(0, 2, 1), tile, dt,
                               min_k=min_k[2]),
            zl=data.zl, zu=data.zu, eq_mask=data.eq_mask,
            interpret=interpret)
    if fmt != "bcoo":
        raise ValueError(f"unknown sparse format {fmt!r}")

    def to_bcoo(M, floor):
        nse = int(np.max(np.sum(np.asarray(M) != 0, axis=(-2, -1))))
        nse = max(((nse + nse_pad - 1) // nse_pad) * nse_pad, 1, floor)
        nse = min(nse, M.shape[-2] * M.shape[-1])
        return jsparse.BCOO.fromdense(M, nse=nse, n_batch=1)

    return SparseQPBatch(Q=to_bcoo(data.Q, min_nse[0]), p=data.p,
                         A0=to_bcoo(data.A0, min_nse[1]),
                         zl=data.zl, zu=data.zu, eq_mask=data.eq_mask)


def _bmv_impl(M: jsparse.BCOO, v: jax.Array) -> jax.Array:
    return jsparse.bcoo_dot_general(
        M, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))))


def _bmv_t_impl(M: jsparse.BCOO, v: jax.Array) -> jax.Array:
    return jsparse.bcoo_dot_general(
        M, v, dimension_numbers=(((1,), (1,)), ((0,), (0,))))


def _zero_ct(x):
    """Zero cotangent with JAX's dtype rules (float0 for integer leaves)."""
    if jnp.issubdtype(x.dtype, jnp.inexact):
        return jnp.zeros_like(x)
    return np.zeros(x.shape, jax.dtypes.float0)


# The BCOO matvecs carry an explicit VJP (dv = Mᵀ·ȳ via the transposed
# bcoo_dot_general; M is problem data -> zero cotangent) instead of relying
# on bcoo_dot_general's transpose rule: that rule produces WRONG gradients
# inside shard_map in jax 0.8 (verified minimal repro: value exact, grad
# off by O(1) — the sampled-transpose path mishandles the manual batch
# axis), and the sparse data-parallel route (make_sparse_chunk_loss) runs
# every matvec under shard_map.

@jax.custom_vjp
def _bmv(M: jsparse.BCOO, v: jax.Array) -> jax.Array:
    """Batched sparse matvec (B,i,j)·(B,j)->(B,i)."""
    return _bmv_impl(M, v)


def _bmv_fwd(M, v):
    return _bmv_impl(M, v), M


def _bmv_bwd(M, g):
    return (jax.tree.map(_zero_ct, M), _bmv_t_impl(M, g))


_bmv.defvjp(_bmv_fwd, _bmv_bwd)


@jax.custom_vjp
def _bmv_t(M: jsparse.BCOO, v: jax.Array) -> jax.Array:
    """Batched transposed sparse matvec (B,i,j)·(B,i)->(B,j)."""
    return _bmv_t_impl(M, v)


def _bmv_t_fwd(M, v):
    return _bmv_t_impl(M, v), M


def _bmv_t_bwd(M, g):
    return (jax.tree.map(_zero_ct, M), _bmv_impl(M, g))


_bmv_t.defvjp(_bmv_t_fwd, _bmv_t_bwd)


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


def obj_fn_sparse(x, data):
    """0.5 xᵀQx + pᵀx with the Q product sparse (dense version:
    evaluation/metrics.obj_fn; reference: utils.py:53-54)."""
    return 0.5 * (x * data.Qv(x)).sum(-1) + (data.p * x).sum(-1)


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


def make_sparse_chunk_loss(sigma, chunk_len: int, outer_T: int,
                           remat: bool = False, mesh=None):
    """Harness ``loss_fn`` hook for the sparse route.

    ``mesh=None``: plain single-device chunk loss.  With a ``('data',)``
    mesh the loss runs under ``shard_map`` over the instance batch axis —
    QP instances are i.i.d. (SURVEY.md §2.4), so data parallelism is a
    trivial split of the batch; each device runs its local BSR/BCOO
    matvec kernels on its shard and the per-chunk loss is ``pmean``-reduced.
    ``shard_map`` is differentiable: the cotangent of the replicated params
    arrives psum-reduced across devices, which is exactly the DP gradient
    all-reduce (XLA lowers it onto ICI)."""
    if mesh is None or "data" not in getattr(mesh, "axis_names", ()):
        def loss_fn(p, st, data, t0):
            return chunk_loss_sparse(p, st, data, sigma, chunk_len,
                                     outer_T, t0, remat=remat)
        return loss_fn

    from jax.sharding import PartitionSpec as P
    from functools import partial

    # check_vma=False: bcoo_dot_general has no varying-manual-axes rule in
    # jax 0.9, so vma tracking marks its (device-varying) output replicated
    # and reverse-mode inserts a bogus psum — gradients come out exactly
    # mesh-size x too large (verified minimal repro; dense ops are exact).
    # With vma checking off, AD follows the plain per-device semantics and
    # matches the single-device gradient to f64 roundoff (tests/test_dist).
    shard_map = partial(jax.shard_map, check_vma=False)

    def loss_fn(p, st, data, t0):
        # BCOO carries its (B, m, n) shape as STATIC metadata, so the
        # object cannot ride through shard_map whole (the leaves would be
        # batch-split while the stale shape still says B).  Ship the raw
        # leaves and rebuild a local-batch BCOO inside the shard.
        if isinstance(data, SparseQPBatch):
            qs, as_ = data.Q.shape[1:], data.A0.shape[1:]
            flat = dict(qd=data.Q.data, qi=data.Q.indices,
                        ad=data.A0.data, ai=data.A0.indices,
                        p=data.p, zl=data.zl, zu=data.zu,
                        eq=data.eq_mask)

            def rebuild(flat):
                Bl = flat["p"].shape[0]
                return SparseQPBatch(
                    Q=jsparse.BCOO((flat["qd"], flat["qi"]),
                                   shape=(Bl,) + qs),
                    A0=jsparse.BCOO((flat["ad"], flat["ai"]),
                                    shape=(Bl,) + as_),
                    p=flat["p"], zl=flat["zl"], zu=flat["zu"],
                    eq_mask=flat["eq"])
        else:
            # BSRQPBatch: the static shape is per-instance (no batch dim),
            # so batch-splitting the vals/cols leaves is safe as-is.
            flat, rebuild = data, lambda d: d

        def local(p, st, flat, t0):
            loss, final = chunk_loss_sparse(p, st, rebuild(flat), sigma,
                                            chunk_len, outer_T, t0,
                                            remat=remat)
            return jax.lax.pmean(loss, "data"), final

        return shard_map(
            local, mesh=mesh,
            in_specs=(P(), P("data"), P("data"), P()),
            out_specs=(P(), P("data")))(p, st, flat, t0)

    return loss_fn


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
