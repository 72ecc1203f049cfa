"""Fused Stage-II (feasibility restoration) Pallas kernel.

The XLA Stage-II paths pay HBM for every matvec: the LU route streams the
factored (n+m)² KKT matrix per polish step (solvers/exact.py), and the
matrix-free CG route re-reads Q and A0 from HBM on every CG iteration
(solvers/cg.py) — with ~100 CG iterations × N polish steps that is
thousands of full passes over the problem data.  Here the whole polish
loop runs as ONE kernel per instance with Q/A0 VMEM-resident in f32
(Stage II is the precision stage — no bf16), so the data is read from HBM
exactly once.

Semantics match ``solvers.cg.feasibility_restoration_cg``: N exact ADMM
iterations (z-relaxation ON, α = 1.6 — reference: models/lu.py:24,43).  ρ
is FIXED across the polish loop (the last learned iteration's schedule,
main.py:882,1061), so the linear system is loop-invariant — factor ONCE
outside the kernel and carry an explicit inverse VMEM-resident; each polish
step's "KKT solve" is then a single MXU matvec, which (unlike triangular
solves) is the only shape the MXU runs at speed of light.  Three in-kernel
solvers:

``solver='kkt'`` (default): explicit f32 inverse of the FULL (n+m)²
saddle-point matrix Ã = [[Q+σI, A0ᵀ], [A0, −diag(1/ρ)]] (batched XLA LU
outside the kernel), solve xv = b̃·Ã⁻¹ in one matvec.  The −1/ρ block makes
Ã far better conditioned than the condensed SPD system M = Q+σI+A0ᵀρA0
that 'direct'/'cg' solve (measured on the flagship family: cond(Ã) ~ 1e2
vs cond(M) ~ 2e5 — condensation squares the ρ_eq = 1e3·ρ imbalance), so a
plain f32 inverse already solves to ~1e-7 relative where the condensed
route saturates at ~1e-4 even with iterative refinement (the f32 residual
b − M·xt cancels catastrophically at cond(M)).  This is the same linear
system the LU route factors — accuracy parity with solvers/exact.py at
explicit-inverse speed.

``solver='direct'``: condensed-system variant (explicit M⁻¹, n² matvec +
``refine`` f32 refinement passes).  Smaller resident inverse (n² vs
(n+m)²) but accuracy-limited by cond(M); kept for the VMEM-constrained
case and as the measured round-2 baseline.

``solver='cg'``: Jacobi-preconditioned CG on M, warm-started across polish
steps.  Matrix-free (no one-time factorization), but accuracy-limited on
ill-conditioned M — the eq-row 1e3·ρ split stalls it near rel 1e-2.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import IterState, QPBatch
from .train_rollout import _round_up, _pad_axis

ALPHA_STAGE2 = 1.6  # reference: models/lu.py:24


def _stage2_kernel(q_ref, a0_ref, p_ref, zl_ref, zu_ref, rho_ref, pc_ref,
                   x0_ref, y0_ref, z0_ref, xt0_ref,
                   x_out, y_out, z_out, xt_out, pr_out, dr_out,
                   x_r, y_r, z_r, xt_r, r_s, pv_s,
                   *, n: int, m: int, N: int, cg_iters: int,
                   sigma: float, tol: float, alpha: float,
                   solver: str, refine: int):
    Q = q_ref[0]
    A0 = a0_ref[0]
    p = p_ref[0]
    zl = zl_ref[0]
    zu = zu_ref[0]
    rho = rho_ref[0]
    # pc_ref: (1, n) Jacobi diagonal for 'cg'; (n, n) M⁻¹ for 'direct';
    # (n+m, n+m) Ã⁻¹ for 'kkt'.

    # True-f32 matvecs: the MXU's default precision truncates f32 operands
    # to bf16 (f32 accumulate), which stalls CG outright on the condensed
    # system's conditioning (rho_eq = 1e3*rho makes cond(M) ~ 1e6 on the
    # flagship family — measured primal 13.8 vs 0.01 for LU).  HIGHEST
    # lowers to the multi-pass f32 MXU path; the kernel stays VMEM-bound.
    _PREC = jax.lax.Precision.HIGHEST

    def mv_q(v):        # (1,n) @ Q -> (1,n), Q symmetric
        return jax.lax.dot_general(v, Q, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=_PREC)

    def mv_a0(v):       # (1,n) -> (1,m)
        return jax.lax.dot_general(v, A0, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=_PREC)

    def mv_a0t(w):      # (1,m) -> (1,n)
        return jax.lax.dot_general(w, A0, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=_PREC)

    def mv_M(v):        # condensed SPD matvec (solvers/cg.py)
        return mv_q(v) + sigma * v + mv_a0t(rho * mv_a0(v))

    x_r[...] = x0_ref[0]
    y_r[...] = y0_ref[0]
    z_r[...] = z0_ref[0]
    xt_r[...] = xt0_ref[0]

    def polish(i, _):
        x = x_r[:]
        y = y_r[:]
        z = z_r[:]

        if solver == "kkt":
            # Full saddle-point solve: xv = b̃·Ã⁻¹ with b̃ = [σx−p; z−y/ρ]
            # (reference: models/lu.py:27-35).  r_s holds b̃ (and refinement
            # residuals), pv_s the solved xv — both sized (1, n+m) here.
            Ainv = pc_ref[0]

            def mv_ainv(v):  # (1, n+m) @ Ã⁻¹ (symmetric saddle point)
                return jax.lax.dot_general(
                    v, Ainv, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=_PREC)

            r_s[:, :n] = sigma * x - p
            r_s[:, n:] = z - y / rho
            pv_s[...] = mv_ainv(r_s[:])
            for _ in range(refine):
                # Blockwise full-KKT residual (Ã never materialized here)
                xt_k = pv_s[:, :n]
                nu_k = pv_s[:, n:]
                r_s[:, :n] = (sigma * x - p) - (
                    mv_q(xt_k) + sigma * xt_k + mv_a0t(nu_k))
                r_s[:, n:] = (z - y / rho) - (mv_a0(xt_k) - nu_k / rho)
                pv_s[...] = pv_s[:] + mv_ainv(r_s[:])
            xt_r[...] = pv_s[:, :n]
        else:
            b = sigma * x - p + mv_a0t(rho * z - y)

        if solver == "direct":
            # xt = b·M⁻¹, then `refine` iterative-refinement passes: the
            # f32 explicit inverse alone solves to ~cond(M)·eps relative;
            # each pass multiplies the error by that factor again.
            Minv = pc_ref[0]

            def mv_minv(v):   # (1,n) @ M⁻¹ (symmetric) -> (1,n)
                return jax.lax.dot_general(
                    v, Minv, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=_PREC)

            xt_r[...] = mv_minv(b)
            for _ in range(refine):
                r_s[...] = b - mv_M(xt_r[:])
                xt_r[...] = xt_r[:] + mv_minv(r_s[:])
        elif solver == "cg":
            # --- Jacobi-preconditioned CG, warm-started from xt_r ---
            diag = pc_ref[0]
            bnorm = jnp.sqrt(jnp.sum(b * b)) + 1e-30
            r_s[...] = b - mv_M(xt_r[:])
            pv_s[...] = r_s[:] / diag
            rz0 = jnp.sum(r_s[:] * pv_s[:])

            def cg(k, rz):
                pv = pv_s[:]
                Ap = mv_M(pv)
                denom = jnp.sum(pv * Ap)
                rnorm = jnp.sqrt(jnp.sum(r_s[:] * r_s[:]))
                active = jnp.logical_and(rnorm / bnorm > tol, denom > 0.0)
                a_k = jnp.where(active,
                                rz / jnp.where(denom == 0.0, 1.0, denom),
                                0.0)
                xt_r[...] = xt_r[:] + a_k * pv
                r_s[...] = r_s[:] - a_k * Ap
                zp = r_s[:] / diag
                rz_new = jnp.sum(r_s[:] * zp)
                beta = jnp.where(active,
                                 rz_new / jnp.where(rz == 0.0, 1.0, rz),
                                 0.0)
                pv_s[...] = zp + beta * pv
                return jnp.where(active, rz_new, rz)

            jax.lax.fori_loop(0, cg_iters, cg, rz0, unroll=False)

        xt = xt_r[:]
        if solver == "kkt":
            nu = pv_s[:, n:]  # ν from the solve (reference: lu.py:37-41)
        else:
            nu = rho * (mv_a0(xt) - z) + y
        # exact ADMM update, z-relaxation ON (reference: models/lu.py:43-45)
        z_t = z + (nu - y) / rho
        x_new = alpha * xt + (1.0 - alpha) * x
        z_temp = alpha * z_t + (1.0 - alpha) * z
        z_new = jnp.minimum(jnp.maximum(z_temp + y / rho, zl), zu)
        y_new = y + rho * (z_temp - z_new)
        x_r[...] = x_new
        y_r[...] = y_new
        z_r[...] = z_new

        v1 = mv_a0(x_new) - z_new
        v2 = mv_q(x_new) + p + mv_a0t(y_new)
        pr_out[0, 0, i] = jnp.sqrt(jnp.sum(v1 * v1))
        dr_out[0, 0, i] = jnp.sqrt(jnp.sum(v2 * v2))
        return 0

    jax.lax.fori_loop(0, N, polish, 0, unroll=False)
    x_out[0] = x_r[:]
    y_out[0] = y_r[:]
    z_out[0] = z_r[:]
    xt_out[0] = xt_r[:]


@functools.partial(jax.jit, static_argnames=("num_iters", "cg_iters",
                                             "sigma", "tol", "interpret",
                                             "solver", "refine"))
def fused_stage2(state: IterState, data: QPBatch, rho_vec: jax.Array,
                 *, num_iters: int, cg_iters: int = 100,
                 sigma: float = 6e-6, tol: float = 1e-8,
                 interpret: bool = False, solver: str = "kkt",
                 refine: int = None
                 ) -> Tuple[IterState, jax.Array, jax.Array]:
    """Run ``num_iters`` fused polish steps; returns (state', pr, dr) with
    per-step primal/dual residual traces of shape (B, num_iters).

    ``solver='kkt'`` (default) inverts the loop-invariant FULL saddle-point
    matrix once (batched XLA LU → explicit f32 Ã⁻¹) and solves in-kernel by
    one MXU matvec per polish step — LU-route accuracy (cond(Ã) ~ 1e2).
    ``solver='direct'`` is the condensed-system variant (explicit M⁻¹ + f32
    refinement, accuracy-limited at cond(M)); ``solver='cg'`` the
    matrix-free Jacobi-CG fallback (no factorization, lowest accuracy).
    ``refine`` defaults per solver: 0 for 'kkt' (the f32 inverse already
    solves to ~1e-7 rel; f32-residual refinement adds nothing), 2 for
    'direct'.

    Operates in whatever space ``data`` lives in — callers follow the
    reference and pass ORIGINAL (unscaled) data and pre-unscaled iterates
    (rollouts.unscale_state), reference: main.py:1017-1064."""
    if solver not in ("kkt", "direct", "cg"):
        raise ValueError(f"unknown stage2 solver {solver!r}")
    if refine is None:
        refine = 0 if solver == "kkt" else 2
    B = data.p.shape[0]
    n_true, m_true = data.num_var, data.num_constr
    n = _round_up(n_true, 128)
    m = _round_up(m_true, 128)

    Q = _pad_axis(_pad_axis(data.Q, n, 1), n, 2).astype(jnp.float32)
    A0 = _pad_axis(_pad_axis(data.A0, m, 1), n, 2).astype(jnp.float32)
    p = _pad_axis(data.p, n, 1).astype(jnp.float32)[:, None]
    zl = _pad_axis(data.zl, m, 1).astype(jnp.float32)[:, None]
    zu = _pad_axis(data.zu, m, 1).astype(jnp.float32)[:, None]
    rho = _pad_axis(rho_vec.astype(jnp.float32)
                    * jnp.ones((B, m_true), jnp.float32), m, 1,
                    fill=1.0)[:, None]
    rho_full = rho_vec * jnp.ones((B, m_true), jnp.float32)
    if solver == "kkt":
        # One-time batched f32 inverse of the padded full KKT matrix.
        # Padding keeps each block 128-aligned and decoupled: the padded
        # x-block diagonal is 1, the padded ν-block diagonal −1 (rho pad
        # fill 1.0), so Ã_pad is invertible and its inverse acts as the
        # identity on the (all-zero) padded entries of b̃.
        dx = jnp.where(jnp.arange(n) < n_true, jnp.float32(sigma),
                       jnp.float32(1.0))
        top = jnp.concatenate(
            [Q + dx * jnp.eye(n, dtype=jnp.float32),
             jnp.swapaxes(A0, 1, 2)], axis=-1)             # (B, n, n+m)
        bot = jnp.concatenate(
            [A0, -(1.0 / rho[:, 0])[:, :, None]
             * jnp.eye(m, dtype=jnp.float32)], axis=-1)    # (B, m, n+m)
        At = jnp.concatenate([top, bot], axis=1)
        with jax.default_matmul_precision("highest"):
            pc = jnp.linalg.inv(At)
        pc_spec_dims = (n + m, n + m)
    elif solver == "direct":
        # One-time batched factorization of the loop-invariant condensed
        # SPD system; the kernel carries the explicit inverse.  f32
        # HIGHEST matmuls — this is the precision stage.
        hi = jax.lax.Precision.HIGHEST
        A0f = data.A0.astype(jnp.float32)
        M = (data.Q.astype(jnp.float32)
             + sigma * jnp.eye(n_true, dtype=jnp.float32)
             + jnp.einsum("bmn,bmk->bnk", A0f * rho_full[..., None], A0f,
                          precision=hi))
        L = jnp.linalg.cholesky(M)
        eye = jnp.broadcast_to(jnp.eye(n_true, dtype=jnp.float32), M.shape)
        Minv = jax.scipy.linalg.cho_solve((L, True), eye)
        # zero padding: padded b entries are 0, so M⁻¹'s padded rows/cols
        # contribute nothing
        pc = _pad_axis(_pad_axis(Minv, n, 1), n, 2)
        pc_spec_dims = (n, n)
    else:
        # Jacobi diagonal (pad entries: sigma-only rows -> 1.0-safe divisor)
        qd = jnp.diagonal(data.Q, axis1=-2, axis2=-1)
        ad = jnp.einsum("bmn,bm->bn", data.A0 ** 2, rho_full)
        pc = _pad_axis((qd + sigma + ad).astype(jnp.float32), n, 1,
                       fill=1.0)[:, None]
        pc_spec_dims = (1, n)
    x0 = _pad_axis(state.x, n, 1).astype(jnp.float32)[:, None]
    y0 = _pad_axis(state.y, m, 1).astype(jnp.float32)[:, None]
    z0 = _pad_axis(state.z, m, 1).astype(jnp.float32)[:, None]
    xt0 = _pad_axis(state.xv[:, :n_true], n, 1).astype(jnp.float32)[:, None]

    inst = lambda d1, d2: pl.BlockSpec((1, d1, d2), lambda b: (b, 0, 0),
                                       memory_space=pltpu.VMEM)
    smem_i = lambda d: pl.BlockSpec((1, 1, d), lambda b: (b, 0, 0),
                                    memory_space=pltpu.SMEM)
    f32 = jnp.float32
    kernel = functools.partial(_stage2_kernel, n=n, m=m, N=num_iters,
                               cg_iters=cg_iters, sigma=float(sigma),
                               tol=float(tol), alpha=ALPHA_STAGE2,
                               solver=solver, refine=refine)
    outs = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[inst(n, n), inst(m, n), inst(1, n), inst(1, m), inst(1, m),
                  inst(1, m), inst(*pc_spec_dims),
                  inst(1, n), inst(1, m), inst(1, m), inst(1, n)],
        out_specs=[inst(1, n), inst(1, m), inst(1, m), inst(1, n),
                   smem_i(num_iters), smem_i(num_iters)],
        out_shape=[jax.ShapeDtypeStruct((B, 1, n), f32),
                   jax.ShapeDtypeStruct((B, 1, m), f32),
                   jax.ShapeDtypeStruct((B, 1, m), f32),
                   jax.ShapeDtypeStruct((B, 1, n), f32),
                   jax.ShapeDtypeStruct((B, 1, num_iters), f32),
                   jax.ShapeDtypeStruct((B, 1, num_iters), f32)],
        scratch_shapes=[pltpu.VMEM((1, n), f32), pltpu.VMEM((1, m), f32),
                        pltpu.VMEM((1, m), f32), pltpu.VMEM((1, n), f32),
                        pltpu.VMEM((1, n + m if solver == "kkt" else n),
                                    f32),
                        pltpu.VMEM((1, n + m if solver == "kkt" else n),
                                    f32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * num_iters
            * ((n + m) ** 2 * (refine + 1) + n * n + 2 * m * n
               if solver == "kkt"
               else (cg_iters + 2) * (n * n + 2 * m * n)),
            bytes_accessed=4 * B * (n * n + m * n
                                    + ((n + m) ** 2 if solver == "kkt"
                                       else 0)),
            transcendentals=0),
        interpret=interpret,
    )(Q, A0, p, zl, zu, rho, pc, x0, y0, z0, xt0)

    x, y, z, xt, pr, dr = outs
    nu = rho_vec * (jnp.einsum("bmn,bn->bm", data.A0, xt[:, 0, :n_true],
                               precision=jax.lax.Precision.HIGHEST)
                    - z[:, 0, :m_true]) + y[:, 0, :m_true]
    xv = jnp.concatenate([xt[:, 0, :n_true], nu], axis=-1)
    st = IterState(x=x[:, 0, :n_true], y=y[:, 0, :m_true],
                   z=z[:, 0, :m_true], xv=xv, H=state.H, C=state.C)
    return st, pr[:, 0], dr[:, 0]
