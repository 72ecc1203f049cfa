"""Training-side Pallas megakernel: fused TBPTT chunks with an in-kernel
hand-derived backward (custom VJP).

The per-step training path (XLA scan + per-step Pallas cell) pays, every
ADMM iteration, the HBM round trip of the recurrent state and the saved
gate activations between forward and backward.  Here a TBPTT chunk is split
into segments of ``J`` iterations; each segment runs as ONE kernel with
everything VMEM-resident:

  * forward segment kernel: J learned iterations (bf16 matvecs against the
    resident Q/A0, bf16-MXU gates with f32 accumulation, f32 H/C carries —
    numerically identical to the ``matvec_mode='bf16', gate_dtype='bfloat16'``
    step path) + the per-iteration primal/dual-residual losses computed
    in-kernel (3 extra matvecs).  Segment-start states are the remat
    checkpoints: the outer ``lax.scan`` over segments stacks them for free.
  * backward segment kernel: recomputes the J steps forward from the
    checkpoint (H stored as-cast bf16 — the exact operand the gate matmuls
    consume — C in f32), then runs the reverse sweep in VMEM, accumulating
    the weight gradients across the J steps and the B grid instances.

Loss convention matches rollouts.chunk_loss with ``loss_mode='bf16'``:
the residual matvecs of the loss use the same bf16 operands as the solver
matvecs (reference loss: utils.py:68-71; hot loop: models/lstm.py:47-96
driven by main.py:336-358).

Differentiates w.r.t. ``params`` only: the cotangents returned for the
initial state and problem data are zeros (the harness takes gradients of
the chunk loss w.r.t. parameters alone; TBPTT detaches state at chunk
boundaries, reference: main.py:353-358).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..solvers.step import RHO_EQ_OVER_RHO_INEQ
from ..types import IterState, QPBatch


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _sig(v):
    return 1.0 / (1.0 + jnp.exp(-v))


def _tanh(v):
    return 2.0 / (1.0 + jnp.exp(-2.0 * v)) - 1.0


def _mv_maker(Q, A0, cdt):
    """Row-vector matvecs against the VMEM-resident Q (symmetric) and A0
    stored in compute dtype ``cdt``, f32 accumulation — the in-kernel
    equivalents of solvers.step.bmv with mode='bf16' (cdt=bfloat16)."""

    def mv_q(v_row):        # (1,n) @ Q -> (1,n)
        return jax.lax.dot_general(
            v_row.astype(cdt), Q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def mv_a0(v_row):       # (1,n) contract A0's n axis -> (1,m)
        return jax.lax.dot_general(
            v_row.astype(cdt), A0, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    def mv_a0t(v_row):      # (1,m) contract A0's m axis -> (1,n)
        return jax.lax.dot_general(
            v_row.astype(cdt), A0, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    return mv_q, mv_a0, mv_a0t


# ---------------------------------------------------------------------------
# Forward segment kernel
# ---------------------------------------------------------------------------

def _fwd_seg_kernel(tb_ref, rho_ref, alpha_ref,
                    q_ref, a0_ref, p_ref, zl_ref, zu_ref, rhom_ref,
                    x0_ref, y0_ref, z0_ref, xv0_ref, h0_ref, c0_ref,
                    w_ref, u_ref, b_ref, wh_ref, bh_ref,
                    x_out, y_out, z_out, xv_out, h_out, c_out,
                    pr_out, dr_out,
                    H, C, xv, g_col, x_r, y_r, z_r,
                    *, n: int, m: int, hidden: int, J: int, sigma: float,
                    cdt=jnp.bfloat16):
    S = n + m
    Q = q_ref[0]
    A0 = a0_ref[0]
    p = p_ref[0]
    zl = zl_ref[0]
    zu = zu_ref[0]
    rhom = rhom_ref[0]
    mv_q, mv_a0, mv_a0t = _mv_maker(Q, A0, cdt)

    H[...] = h0_ref[0]
    C[...] = c0_ref[0]
    xv[...] = xv0_ref[0]
    x_r[...] = x0_ref[0]
    y_r[...] = y0_ref[0]
    z_r[...] = z0_ref[0]
    h = hidden

    def step(k, _):
        t = tb_ref[0, 0] + k
        rho_t = _sig(rho_ref[0, t])
        alpha_t = 2.0 * _sig(alpha_ref[0, t])
        rho_row = rho_t * rhom

        x = x_r[:]
        y = y_r[:]
        z = z_r[:]
        u_row = xv[0:n, :].reshape(1, n)
        nu_row = xv[n:S, :].reshape(1, m)

        b1 = sigma * x - p
        r1 = mv_q(u_row) + sigma * u_row + mv_a0t(nu_row) - b1
        r2 = mv_a0(u_row) - (nu_row - y) / rho_row - z
        g1 = mv_q(r1) + sigma * r1 + mv_a0t(r2)
        g2 = mv_a0(r1) - r2 / rho_row
        g_col[0:n, :] = g1.reshape(n, 1)
        g_col[n:S, :] = g2.reshape(m, 1)

        gates = (xv[:] * w_ref[0:1, :] + g_col[:] * w_ref[1:2, :]
                 + jax.lax.dot_general(
                     H[:].astype(cdt), u_ref[:],
                     (((1,), (0,)), ((), ())),
                     preferred_element_type=jnp.float32)
                 + b_ref[:])
        i_t = _sig(gates[:, 0 * h:1 * h])
        f_t = _sig(gates[:, 1 * h:2 * h])
        o_t = _sig(gates[:, 2 * h:3 * h])
        u_t = _tanh(gates[:, 3 * h:4 * h])
        C_new = i_t * u_t + f_t * C[:]
        H_new = o_t * _tanh(C_new)
        delta = jax.lax.dot_general(
            H_new.astype(cdt), wh_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + bh_ref[:]
        H[...] = H_new
        C[...] = C_new
        xv[...] = xv[:] - delta

        x_t = xv[0:n, :].reshape(1, n)
        v = xv[n:S, :].reshape(1, m)
        z_t = z + (v - y) / rho_row
        x_new = alpha_t * x_t + (1.0 - alpha_t) * x
        z_new = jnp.minimum(jnp.maximum(z_t + y / rho_row, zl), zu)
        y_new = y + rho_row * (z_t - z_new)
        x_r[...] = x_new
        y_r[...] = y_new
        z_r[...] = z_new

        # per-iteration training loss pieces (reference: utils.py:68-71)
        v1 = mv_a0(x_new) - z_new
        v2 = mv_q(x_new) + p + mv_a0t(y_new)
        pr_out[0, 0, k] = jnp.sqrt(jnp.sum(v1 * v1))
        dr_out[0, 0, k] = jnp.sqrt(jnp.sum(v2 * v2))
        return 0

    jax.lax.fori_loop(0, J, step, 0, unroll=False)
    x_out[0] = x_r[:]
    y_out[0] = y_r[:]
    z_out[0] = z_r[:]
    xv_out[0] = xv[:]
    h_out[0] = H[:]
    c_out[0] = C[:]


# ---------------------------------------------------------------------------
# Backward segment kernel
# ---------------------------------------------------------------------------

def _bwd_seg_kernel(tb_ref, rho_ref, alpha_ref,
                    q_ref, a0_ref, p_ref, zl_ref, zu_ref, rhom_ref,
                    x0_ref, y0_ref, z0_ref, xv0_ref, h0_ref, c0_ref,
                    w_ref, u_ref, b_ref, wh_ref, bh_ref,
                    dx_in, dy_in, dz_in, dxv_in, dh_in, dc_in,
                    dpr_ref, ddr_ref,
                    # outputs
                    dx0, dy0, dz0, dxv0, dh0, dc0,
                    dW, dU, db, dWh, dbh, drho, dalpha,
                    # scratch
                    Hs, Cs, xvs, xs, ys, zs,
                    H, C, dH, dC, dxv, dx_r, dy_r, dz_r,
                    *, n: int, m: int, hidden: int, J: int, sigma: float,
                    cdt=jnp.bfloat16):
    S = n + m
    Q = q_ref[0]
    A0 = a0_ref[0]
    p = p_ref[0]
    zl = zl_ref[0]
    zu = zu_ref[0]
    rhom = rhom_ref[0]
    mv_q, mv_a0, mv_a0t = _mv_maker(Q, A0, cdt)
    h = hidden
    b_idx = pl.program_id(0)

    # ---- forward recompute sweep: store pre-step states (H as the cdt
    # operand the gate matmuls consume, C in f32; vectors are cheap) ----
    H[...] = h0_ref[0]
    C[...] = c0_ref[0]
    xvs[0] = xv0_ref[0]
    xs[0] = x0_ref[0]
    ys[0] = y0_ref[0]
    zs[0] = z0_ref[0]

    def fstep(k, _):
        t = tb_ref[0, 0] + k
        rho_t = _sig(rho_ref[0, t])
        alpha_t = 2.0 * _sig(alpha_ref[0, t])
        rho_row = rho_t * rhom
        Hs[k] = H[:].astype(cdt)
        Cs[k] = C[:]
        x = xs[k]
        y = ys[k]
        z = zs[k]
        xv_k = xvs[k]
        u_row = xv_k[0:n, :].reshape(1, n)
        nu_row = xv_k[n:S, :].reshape(1, m)
        b1 = sigma * x - p
        r1 = mv_q(u_row) + sigma * u_row + mv_a0t(nu_row) - b1
        r2 = mv_a0(u_row) - (nu_row - y) / rho_row - z
        g1 = mv_q(r1) + sigma * r1 + mv_a0t(r2)
        g2 = mv_a0(r1) - r2 / rho_row
        g_col = jnp.concatenate([g1.reshape(n, 1), g2.reshape(m, 1)], axis=0)
        gates = (xv_k * w_ref[0:1, :] + g_col * w_ref[1:2, :]
                 + jax.lax.dot_general(Hs[k], u_ref[:],
                                       (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
                 + b_ref[:])
        i_t = _sig(gates[:, 0 * h:1 * h])
        f_t = _sig(gates[:, 1 * h:2 * h])
        o_t = _sig(gates[:, 2 * h:3 * h])
        u_t = _tanh(gates[:, 3 * h:4 * h])
        C_new = i_t * u_t + f_t * C[:]
        H_new = o_t * _tanh(C_new)
        delta = jax.lax.dot_general(
            H_new.astype(cdt), wh_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + bh_ref[:]
        H[...] = H_new
        C[...] = C_new
        xv_new = xv_k - delta
        xvs[k + 1] = xv_new
        x_t = xv_new[0:n, :].reshape(1, n)
        v = xv_new[n:S, :].reshape(1, m)
        z_t = z + (v - y) / rho_row
        x_new = alpha_t * x_t + (1.0 - alpha_t) * x
        z_new = jnp.minimum(jnp.maximum(z_t + y / rho_row, zl), zu)
        y_new = y + rho_row * (z_t - z_new)
        xs[k + 1] = x_new
        ys[k + 1] = y_new
        zs[k + 1] = z_new
        return 0

    jax.lax.fori_loop(0, J, fstep, 0, unroll=False)
    Hs[J] = H[:].astype(cdt)
    Cs[J] = C[:]

    # ---- reverse sweep ----
    @pl.when(b_idx == 0)
    def _():
        dW[...] = jnp.zeros_like(dW)
        dU[...] = jnp.zeros_like(dU)
        db[...] = jnp.zeros_like(db)
        dWh[...] = jnp.zeros_like(dWh)
        dbh[...] = jnp.zeros_like(dbh)

        # drho/dalpha live in SMEM: Mosaic only lowers SCALAR stores to SMEM
        # inside a cond branch, so zero them element-wise (J is small).
        def zero_sched(i, _):
            drho[0, i] = 0.0
            dalpha[0, i] = 0.0
            return 0

        jax.lax.fori_loop(0, J, zero_sched, 0, unroll=True)

    dH[...] = dh_in[0]
    dC[...] = dc_in[0]
    dxv[...] = dxv_in[0]
    dx_r[...] = dx_in[0]
    dy_r[...] = dy_in[0]
    dz_r[...] = dz_in[0]

    def bstep(kk, _):
        k = J - 1 - kk
        t = tb_ref[0, 0] + k
        rho_raw = rho_ref[0, t]
        alpha_raw = alpha_ref[0, t]
        rho_t = _sig(rho_raw)
        alpha_t = 2.0 * _sig(alpha_raw)
        rho_row = rho_t * rhom

        x = xs[k]          # pre-step (1, n)
        y = ys[k]
        z = zs[k]
        xv_k = xvs[k]      # (S, 1)
        xv_new = xvs[k + 1]
        x_new = xs[k + 1]
        y_new = ys[k + 1]
        z_new = zs[k + 1]
        H_k = Hs[k]        # bf16 (S, h)
        C_k = Cs[k]        # f32
        C_new = Cs[k + 1]
        H_new_b = Hs[k + 1]

        u_row = xv_k[0:n, :].reshape(1, n)
        nu_row = xv_k[n:S, :].reshape(1, m)
        x_t = xv_new[0:n, :].reshape(1, n)
        v = xv_new[n:S, :].reshape(1, m)
        z_t = z + (v - y) / rho_row
        w_clip = z_t + y / rho_row
        mask = jnp.logical_and(w_clip >= zl, w_clip <= zu
                               ).astype(jnp.float32)

        # recompute the KKT feature pieces needed by the backward
        b1 = sigma * x - p
        r1 = mv_q(u_row) + sigma * u_row + mv_a0t(nu_row) - b1
        r2 = mv_a0(u_row) - (nu_row - y) / rho_row - z

        # ---- loss backward: pr = |A0 x' - z''|, dr = |Q x' + p + A0^T y'| --
        dpr_t = dpr_ref[0, 0, k]
        ddr_t = ddr_ref[0, 0, k]
        v1 = mv_a0(x_new) - z_new
        v2 = mv_q(x_new) + p + mv_a0t(y_new)
        pr_n = jnp.sqrt(jnp.sum(v1 * v1))
        dr_n = jnp.sqrt(jnp.sum(v2 * v2))
        dv1 = (dpr_t / jnp.maximum(pr_n, 1e-30)) * v1
        dv2 = (ddr_t / jnp.maximum(dr_n, 1e-30)) * v2
        dxn = dx_r[:] + mv_a0t(dv1) + mv_q(dv2)
        dyn = dy_r[:] + mv_a0(dv2)
        dzn = dz_r[:] - dv1

        # ---- ADMM update backward ----
        # y' = y + rho (z_t - z''); z'' = clip(w); w = z_t + y/rho;
        # x' = a x_t + (1-a) x;  z_t = z + (v - y)/rho
        drho_vec = dyn * (z_t - z_new)
        dz_t = rho_row * dyn
        dznn = -rho_row * dyn + dzn          # cotangent of z'' from clip
        dw = dznn * mask
        dz_t = dz_t + dw
        dy = dyn + dw / rho_row   # dyn: the identity term of y' = y + ...
        drho_vec = drho_vec - dw * y / (rho_row * rho_row)
        dxt = alpha_t * dxn
        dx = (1.0 - alpha_t) * dxn
        dalpha_s = jnp.sum(dxn * (x_t - x))
        dz = dz_t
        dv_ = dz_t / rho_row
        dy = dy - dz_t / rho_row
        drho_vec = drho_vec - dz_t * (v - y) / (rho_row * rho_row)

        # ---- cell backward ----
        dxv_new = dxv[:] + jnp.concatenate(
            [dxt.reshape(n, 1), dv_.reshape(m, 1)], axis=0)
        ddelta = -dxv_new                       # xv' = xv - delta
        # delta = H' @ W_h + b_h
        dH_new = dH[:] + jax.lax.dot_general(
            ddelta.astype(cdt), wh_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dWh[...] += jax.lax.dot_general(
            H_new_b, ddelta.astype(cdt), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dbh[...] += jnp.sum(ddelta, axis=0, keepdims=True)
        # H' = o * tanh(C'); C' = i*u + f*C (activations recomputed below)
        tC = _tanh(C_new)

        # recompute the KKT feature column for this step
        g_q1 = mv_q(r1) + sigma * r1 + mv_a0t(r2)
        g_q2 = mv_a0(r1) - r2 / rho_row
        g_col = jnp.concatenate([g_q1.reshape(n, 1), g_q2.reshape(m, 1)],
                                axis=0)

        # Gate pre-activations per QUARTER ((S, h) at a time — the full
        # (S, 4h) gates + dgates would not fit VMEM at flagship shapes).
        def quarter_pre(q):
            return (xv_k * w_ref[0:1, pl.ds(q * h, h)]
                    + g_col * w_ref[1:2, pl.ds(q * h, h)]
                    + jax.lax.dot_general(
                        H_k, u_ref[:, pl.ds(q * h, h)],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    + b_ref[:, pl.ds(q * h, h)])

        i_t = _sig(quarter_pre(0))
        f_t = _sig(quarter_pre(1))
        o_t = _sig(quarter_pre(2))
        u_t = _tanh(quarter_pre(3))

        do = dH_new * tC
        dC_new = dC[:] + dH_new * o_t * (1.0 - tC * tC)
        di = dC_new * u_t
        du = dC_new * i_t
        df = dC_new * C_k
        dC[...] = dC_new * f_t

        # dpre per quarter, immediately contracted into the weight grads,
        # the recurrent cotangent dH, and the input cotangents.
        dxv_k = dxv_new
        dg = jnp.zeros_like(dxv_new)
        dH_acc = jnp.zeros_like(dC_new)
        for q, dpre in enumerate((di * i_t * (1.0 - i_t),
                                  df * f_t * (1.0 - f_t),
                                  do * o_t * (1.0 - o_t),
                                  du * (1.0 - u_t * u_t))):
            dpre_b = dpre.astype(cdt)
            dU[:, pl.ds(q * h, h)] += jax.lax.dot_general(
                H_k, dpre_b, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            db[:, pl.ds(q * h, h)] += jnp.sum(dpre, axis=0, keepdims=True)
            dW[0:1, pl.ds(q * h, h)] += jnp.sum(xv_k * dpre, axis=0,
                                                keepdims=True)
            dW[1:2, pl.ds(q * h, h)] += jnp.sum(g_col * dpre, axis=0,
                                                keepdims=True)
            dH_acc = dH_acc + jax.lax.dot_general(
                dpre_b, u_ref[:, pl.ds(q * h, h)], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dxv_k = dxv_k + jnp.sum(dpre * w_ref[0:1, pl.ds(q * h, h)],
                                    axis=1, keepdims=True)
            dg = dg + jnp.sum(dpre * w_ref[1:2, pl.ds(q * h, h)],
                              axis=1, keepdims=True)
        dH[...] = dH_acc

        # ---- KKT feature backward ----
        dg1 = dg[0:n, :].reshape(1, n)
        dg2 = dg[n:S, :].reshape(1, m)
        # g2 = A0 r1 - r2/rho  ->  d(g2)/d(rho_vec) = r2/rho^2
        drho_vec = drho_vec + dg2 * r2 / (rho_row * rho_row)
        dr1 = mv_q(dg1) + sigma * dg1 + mv_a0t(dg2)
        dr2 = mv_a0(dg1) - dg2 / rho_row
        # r1 = Q u + sigma u + A0^T nu - (sigma x - p)
        du_ = mv_q(dr1) + sigma * dr1 + mv_a0t(dr2)
        dnu = mv_a0(dr1) - dr2 / rho_row
        dx = dx - sigma * dr1
        # r2 = A0 u - (nu - y)/rho - z
        dy = dy + dr2 / rho_row
        dz = dz - dr2
        drho_vec = drho_vec + dr2 * (nu_row - y) / (rho_row * rho_row)

        dxv[...] = dxv_k + jnp.concatenate(
            [du_.reshape(n, 1), dnu.reshape(m, 1)], axis=0)
        dx_r[...] = dx
        dy_r[...] = dy
        dz_r[...] = dz

        # schedule scalars
        drho_t = jnp.sum(drho_vec * rhom) * rho_t * (1.0 - rho_t)
        dalpha_t = dalpha_s * 2.0 * _sig(alpha_raw) * (1.0 - _sig(alpha_raw))
        drho[0, k] += drho_t
        dalpha[0, k] += dalpha_t
        return 0

    jax.lax.fori_loop(0, J, bstep, 0, unroll=False)
    dx0[0] = dx_r[:]
    dy0[0] = dy_r[:]
    dz0[0] = dz_r[:]
    dxv0[0] = dxv[:]
    dh0[0] = dH[:]
    dc0[0] = dC[:]


# ---------------------------------------------------------------------------
# Host-side wrappers: padding, pallas_call builders, segment scan, custom VJP
# ---------------------------------------------------------------------------

def pick_segment_len(n_pad: int, m_pad: int, hidden: int, chunk_len: int,
                     budget: float = 100e6) -> int:
    """Largest divisor of chunk_len whose backward-kernel VMEM estimate fits
    the budget (see module docstring for the buffer inventory)."""
    S = n_pad + m_pad
    fixed = (2 * n_pad * n_pad + 2 * m_pad * n_pad        # Q, A0 bf16
             + 2 * hidden * 4 * hidden                     # U bf16
             + 4 * hidden * 4 * hidden                     # dU f32
             + 4 * S * hidden * 4                          # H,C,dH,dC f32
             + 8 * S * hidden * 4)                         # acts + temporaries
    per_j = 6 * S * hidden                                 # Hs bf16 + Cs f32
    best = 1
    for j in range(1, min(chunk_len, 16) + 1):
        if chunk_len % j == 0 and fixed + (j + 1) * per_j <= budget:
            best = j
    return best


def _pad_axis(a, size, axis, fill=0.0):
    pad = [(0, 0)] * a.ndim
    pad[axis] = (0, size - a.shape[axis])
    return jnp.pad(a, pad, constant_values=fill)


def _pack_data(data: QPBatch, n: int, m: int, cdt=jnp.bfloat16):
    """Pad to lane-aligned (n, m) and cast the matrices to the compute
    dtype; returns the flat tuple the kernels consume.  Pad bounds are
    [0, 0] and the pad rho multiplier 1.0 so pad iterates stay inert (same
    argument as the inference megakernel, rollout_kernel.fused_rollout)."""
    Q = _pad_axis(_pad_axis(data.Q, n, 1), n, 2).astype(cdt)
    A0 = _pad_axis(_pad_axis(data.A0, m, 1), n, 2).astype(cdt)
    p = _pad_axis(data.p, n, 1).astype(jnp.float32)[:, None]
    zl = _pad_axis(data.zl, m, 1).astype(jnp.float32)[:, None]
    zu = _pad_axis(data.zu, m, 1).astype(jnp.float32)[:, None]
    rhom = _pad_axis(jnp.where(data.eq_mask, RHO_EQ_OVER_RHO_INEQ,
                               1.0).astype(jnp.float32), m, 1,
                     fill=1.0)[:, None]
    return Q, A0, p, zl, zu, rhom


def _pack_state(st: IterState, n_true: int, n: int, m: int, hidden: int):
    """Split the (n_true+m_true) token axis and re-pad each block."""
    B = st.x.shape[0]

    def tok(a, width):
        top = _pad_axis(a[:, :n_true], n, 1)
        bot = _pad_axis(a[:, n_true:], m, 1)
        return jnp.concatenate([top, bot], axis=1).astype(jnp.float32)

    x = _pad_axis(st.x, n, 1).astype(jnp.float32)[:, None]
    y = _pad_axis(st.y, m, 1).astype(jnp.float32)[:, None]
    z = _pad_axis(st.z, m, 1).astype(jnp.float32)[:, None]
    xv = tok(st.xv, 1)[..., None]
    H = tok(st.H, hidden)
    C = tok(st.C, hidden)
    return x, y, z, xv, H, C


def _unpack_state(t, n_true: int, m_true: int, n: int) -> IterState:
    x, y, z, xv, H, C = t
    S0 = n + m_true

    def untok(a):
        return jnp.concatenate([a[:, :n_true], a[:, n:S0]], axis=1)

    return IterState(x=x[:, 0, :n_true], y=y[:, 0, :m_true],
                     z=z[:, 0, :m_true], xv=untok(xv[..., 0]),
                     H=untok(H), C=untok(C))


def _specs(B, n, m, hidden, J, K_total):
    S = n + m
    smem = lambda r, c: pl.BlockSpec((r, c), lambda b: (0, 0),
                                     memory_space=pltpu.SMEM)
    shared = lambda r, c: pl.BlockSpec((r, c), lambda b: (0, 0),
                                       memory_space=pltpu.VMEM)
    inst3 = lambda d1, d2: pl.BlockSpec((1, d1, d2), lambda b: (b, 0, 0),
                                        memory_space=pltpu.VMEM)
    smem_i = lambda d1, d2: pl.BlockSpec((1, d1, d2), lambda b: (b, 0, 0),
                                         memory_space=pltpu.SMEM)
    sched = [smem(1, 1), smem(1, K_total), smem(1, K_total)]
    dat = [inst3(n, n), inst3(m, n), inst3(1, n), inst3(1, m), inst3(1, m),
           inst3(1, m)]
    state = [inst3(1, n), inst3(1, m), inst3(1, m), inst3(S, 1),
             inst3(S, hidden), inst3(S, hidden)]
    weights = [shared(2, 4 * hidden), shared(hidden, 4 * hidden),
               shared(1, 4 * hidden), shared(hidden, 1), shared(1, 1)]
    return sched, dat, state, weights, inst3, shared, smem, smem_i


def _state_shapes(B, n, m, hidden):
    S = n + m
    f32 = jnp.float32
    return [jax.ShapeDtypeStruct((B, 1, n), f32),
            jax.ShapeDtypeStruct((B, 1, m), f32),
            jax.ShapeDtypeStruct((B, 1, m), f32),
            jax.ShapeDtypeStruct((B, S, 1), f32),
            jax.ShapeDtypeStruct((B, S, hidden), f32),
            jax.ShapeDtypeStruct((B, S, hidden), f32)]


def _make_fwd_call(B, n, m, hidden, J, K_total, sigma, interpret,
                   cdt=jnp.bfloat16):
    S = n + m
    sched, dat, state, weights, inst3, shared, smem, smem_i = _specs(
        B, n, m, hidden, J, K_total)
    kernel = functools.partial(_fwd_seg_kernel, n=n, m=m, hidden=hidden,
                               J=J, sigma=float(sigma), cdt=cdt)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=sched + dat + state + weights,
        out_specs=[*state, smem_i(1, J), smem_i(1, J)],
        out_shape=[*_state_shapes(B, n, m, hidden),
                   jax.ShapeDtypeStruct((B, 1, J), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1, J), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((S, hidden), jnp.float32),   # H
            pltpu.VMEM((S, hidden), jnp.float32),   # C
            pltpu.VMEM((S, 1), jnp.float32),        # xv
            pltpu.VMEM((S, 1), jnp.float32),        # g
            pltpu.VMEM((1, n), jnp.float32),        # x
            pltpu.VMEM((1, m), jnp.float32),        # y
            pltpu.VMEM((1, m), jnp.float32),        # z
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * J * (S * (hidden + 2) * 4 * hidden
                               + 7 * (n * n + 2 * m * n)),
            bytes_accessed=2 * B * (n * n + m * n + 8 * S * hidden),
            transcendentals=5 * B * J * S * hidden),
        interpret=interpret,
    )


def _make_bwd_call(B, n, m, hidden, J, K_total, sigma, interpret,
                   cdt=jnp.bfloat16):
    S = n + m
    sched, dat, state, weights, inst3, shared, smem, smem_i = _specs(
        B, n, m, hidden, J, K_total)
    kernel = functools.partial(_bwd_seg_kernel, n=n, m=m, hidden=hidden,
                               J=J, sigma=float(sigma), cdt=cdt)
    f32 = jnp.float32
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=(sched + dat + state + weights
                  + state                       # d(state_out) cotangents
                  + [smem_i(1, J), smem_i(1, J)]),   # dpr, ddr
        out_specs=[*state,                      # d(state_in) cotangents
                   shared(2, 4 * hidden), shared(hidden, 4 * hidden),
                   shared(1, 4 * hidden), shared(hidden, 1), shared(1, 1),
                   smem(1, J), smem(1, J)],
        out_shape=[*_state_shapes(B, n, m, hidden),
                   jax.ShapeDtypeStruct((2, 4 * hidden), f32),
                   jax.ShapeDtypeStruct((hidden, 4 * hidden), f32),
                   jax.ShapeDtypeStruct((1, 4 * hidden), f32),
                   jax.ShapeDtypeStruct((hidden, 1), f32),
                   jax.ShapeDtypeStruct((1, 1), f32),
                   jax.ShapeDtypeStruct((1, J), f32),
                   jax.ShapeDtypeStruct((1, J), f32)],
        scratch_shapes=[
            pltpu.VMEM((J + 1, S, hidden), cdt),           # Hs
            pltpu.VMEM((J + 1, S, hidden), jnp.float32),   # Cs
            pltpu.VMEM((J + 1, S, 1), jnp.float32),        # xvs
            pltpu.VMEM((J + 1, 1, n), jnp.float32),        # xs
            pltpu.VMEM((J + 1, 1, m), jnp.float32),        # ys
            pltpu.VMEM((J + 1, 1, m), jnp.float32),        # zs
            pltpu.VMEM((S, hidden), jnp.float32),          # H carry
            pltpu.VMEM((S, hidden), jnp.float32),          # C carry
            pltpu.VMEM((S, hidden), jnp.float32),          # dH
            pltpu.VMEM((S, hidden), jnp.float32),          # dC
            pltpu.VMEM((S, 1), jnp.float32),               # dxv
            pltpu.VMEM((1, n), jnp.float32),               # dx
            pltpu.VMEM((1, m), jnp.float32),               # dy
            pltpu.VMEM((1, m), jnp.float32),               # dz
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=8 * B * J * (S * (hidden + 2) * 4 * hidden
                               + 7 * (n * n + 2 * m * n)),
            bytes_accessed=2 * B * (n * n + m * n + 16 * S * hidden),
            transcendentals=10 * B * J * S * hidden),
        interpret=interpret,
    )


def make_fused_chunk_loss(*, num_var: int, num_constr: int, batch: int,
                          hidden: int, sigma: float, chunk_len: int,
                          outer_T: int, K_total: int,
                          interpret: bool = False, seg: int = 0,
                          compute_dtype: str = "bfloat16", mesh=None):
    """Build a drop-in for ``rollouts.chunk_loss`` backed by the fused
    training megakernel: ``fn(params, state, data, t0) -> (loss, state')``.

    Loss numerics follow ``chunk_loss`` with ``loss_mode='bf16'`` (the
    resident matrices are bf16).  Differentiates w.r.t. params only.

    ``mesh``: a ``('data',)`` mesh makes the returned fn data-parallel via
    ``shard_map`` — each device runs the kernel on its shard of the
    instance batch (``batch`` here is the PER-DEVICE batch), the chunk loss
    is ``pmean``-ed over 'data', and shard_map's transpose inserts the
    gradient all-reduce over ICI (SURVEY.md §2.4 DP row).
    """
    import numpy as np

    n = _round_up(num_var, 128)
    m = _round_up(num_constr, 128)
    J = seg or pick_segment_len(n, m, hidden, chunk_len)
    n_segs = chunk_len // J
    B = batch
    cdt = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    fwd_call = _make_fwd_call(B, n, m, hidden, J, K_total, sigma, interpret,
                              cdt)
    bwd_call = _make_bwd_call(B, n, m, hidden, J, K_total, sigma, interpret,
                              cdt)

    def _run_fwd(params, state_t, data_t, t0):
        W = params["W"].astype(cdt)
        U = params["U"].astype(cdt)
        b2 = params["b"].reshape(1, -1).astype(jnp.float32)
        Wh = params["W_h"].astype(cdt)
        bh2 = params["b_h"].reshape(1, -1).astype(jnp.float32)
        rho = params["rho"].reshape(1, -1).astype(jnp.float32)
        alpha = params["alpha"].reshape(1, -1).astype(jnp.float32)

        def seg_step(carry, s):
            tb = (t0 + s * J).reshape(1, 1).astype(jnp.int32)
            out = fwd_call(tb, rho, alpha, *data_t, *carry,
                           W, U, b2, Wh, bh2)
            new_state, pr, dr = tuple(out[:6]), out[6], out[7]
            return new_state, (carry, pr[:, 0, :], dr[:, 0, :])

        final, (ckpts, prs, drs) = jax.lax.scan(
            seg_step, state_t, jnp.arange(n_segs))
        # (n_segs, B, J) -> (B, K)
        pr = jnp.moveaxis(prs, 0, 1).reshape(B, chunk_len)
        dr = jnp.moveaxis(drs, 0, 1).reshape(B, chunk_len)
        return pr, dr, final, ckpts

    @jax.custom_vjp
    def rollout_chunk(params, state_t, data_t, t0):
        pr, dr, final, _ = _run_fwd(params, state_t, data_t, t0)
        return pr, dr, final

    def _vjp_fwd(params, state_t, data_t, t0):
        pr, dr, final, ckpts = _run_fwd(params, state_t, data_t, t0)
        return (pr, dr, final), (params, state_t, data_t, t0, ckpts)

    def _vjp_bwd(res, cots):
        params, state_t, data_t, t0, ckpts = res
        dpr, ddr, dfinal = cots
        W = params["W"].astype(cdt)
        U = params["U"].astype(cdt)
        b2 = params["b"].reshape(1, -1).astype(jnp.float32)
        Wh = params["W_h"].astype(cdt)
        bh2 = params["b_h"].reshape(1, -1).astype(jnp.float32)
        rho = params["rho"].reshape(1, -1).astype(jnp.float32)
        alpha = params["alpha"].reshape(1, -1).astype(jnp.float32)
        h = hidden
        g0 = (jnp.zeros((2, 4 * h)), jnp.zeros((h, 4 * h)),
              jnp.zeros((1, 4 * h)), jnp.zeros((h, 1)), jnp.zeros((1, 1)))
        dpr_seg = jnp.moveaxis(dpr.reshape(B, n_segs, 1, J), 1, 0)
        ddr_seg = jnp.moveaxis(ddr.reshape(B, n_segs, 1, J), 1, 0)

        def seg_bwd(carry, xs):
            dstate, acc = carry
            ck, dprs, ddrs, s = xs
            tb = (t0 + s * J).reshape(1, 1).astype(jnp.int32)
            out = bwd_call(tb, rho, alpha, *data_t, *ck, W, U, b2, Wh, bh2,
                           *dstate, dprs.astype(jnp.float32),
                           ddrs.astype(jnp.float32))
            dstate_in = tuple(out[:6])
            grads = tuple(out[6:11])
            acc = tuple(a + g for a, g in zip(acc, grads))
            return (dstate_in, acc), (out[11], out[12])

        (dstate0, acc), (drho_segs, dalpha_segs) = jax.lax.scan(
            seg_bwd, (dfinal, g0),
            (ckpts, dpr_seg, ddr_seg, jnp.arange(n_segs)), reverse=True)
        dW, dU_, db_, dWh, dbh = acc
        drho_chunk = drho_segs[:, 0, :].reshape(chunk_len)
        dalpha_chunk = dalpha_segs[:, 0, :].reshape(chunk_len)
        zK = jnp.zeros((K_total,), jnp.float32)
        d_params = dict(
            W=dW.astype(params["W"].dtype),
            U=dU_.astype(params["U"].dtype),
            b=db_.reshape(-1).astype(params["b"].dtype),
            W_h=dWh.astype(params["W_h"].dtype),
            b_h=dbh.reshape(-1).astype(params["b_h"].dtype),
            rho=jax.lax.dynamic_update_slice(
                zK, drho_chunk, (t0,)).astype(params["rho"].dtype),
            alpha=jax.lax.dynamic_update_slice(
                zK, dalpha_chunk, (t0,)).astype(params["alpha"].dtype))
        d_state = jax.tree.map(jnp.zeros_like, state_t)
        d_data = jax.tree.map(jnp.zeros_like, data_t)
        d_t0 = np.zeros(jnp.shape(t0), jax.dtypes.float0)
        return d_params, d_state, d_data, d_t0

    rollout_chunk.defvjp(_vjp_fwd, _vjp_bwd)

    def fused_chunk_loss(params, state: IterState, data: QPBatch, t0):
        data_t = _pack_data(data, n, m, cdt)
        state_t = _pack_state(state, num_var, n, m, hidden)
        t0 = jnp.asarray(t0, jnp.int32)
        pr, dr, final = rollout_chunk(params, state_t, data_t, t0)
        loss = (pr + dr).mean(axis=0).sum() / outer_T
        return loss, _unpack_state(final, num_var, num_constr, n)

    fused_chunk_loss.segment_len = J
    if mesh is None:
        return fused_chunk_loss

    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    def dp_chunk_loss(params, state: IterState, data: QPBatch, t0):
        def local(params, state, data, t0):
            loss, st = fused_chunk_loss(params, state, data, t0)
            return jax.lax.pmean(loss, "data"), st

        pspec = jax.tree.map(lambda _: P(), params)
        sspec = jax.tree.map(lambda _: P("data"), state)
        dspec = jax.tree.map(lambda _: P("data"), data)
        return shard_map(local, mesh=mesh,
                         in_specs=(pspec, sspec, dspec, P()),
                         out_specs=(P(), sspec),
                         check_vma=False)(params, state, data, t0)

    dp_chunk_loss.segment_len = J
    return dp_chunk_loss
