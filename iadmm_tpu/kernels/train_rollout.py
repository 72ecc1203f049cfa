"""Training-side Pallas megakernel: fused TBPTT chunks with an in-kernel
hand-derived backward (custom VJP).

The per-step training path (XLA scan + per-step Pallas cell) pays, every
ADMM iteration, the HBM round trip of the recurrent state and the saved
gate activations between forward and backward.  Here a TBPTT chunk is split
into segments of ``J`` iterations; each segment runs as ONE kernel with
the hot state VMEM-resident:

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

VMEM discipline (the real-TPU compiler budget is 128 MB/core):

  * The ``(S, hidden)`` recurrent state and its cotangents move through the
    kernels as ``pl.ANY`` (HBM-resident) operands with explicit DMA into
    the carry scratch buffers — NOT as grid-windowed VMEM operands, whose
    automatic double buffering alone would blow the budget at the flagship
    shape (2 x 2 x 7 MB per state array).
  * The LSTM gate math is tiled over the token axis S with one gate
    quarter live at a time; the full ``(S, 4h)`` pre-activation tensor
    (26 MB at flagship) never exists, which is what kept the register
    allocator from spilling ~45 MB of vector state.
  * The backward reuses the forward-recompute H/C carries as the dH/dC
    reverse-sweep carries (disjoint live ranges).

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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..solvers.step import RHO_EQ_OVER_RHO_INEQ
from ..types import IterState, QPBatch


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _tile_rows(S: int) -> int:
    """Token-axis tile: S is always a multiple of 128 (n, m each padded)."""
    for r in (512, 256, 128):
        if S % r == 0:
            return r
    return S


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


def _cell_update_tiled(H_s, C_s, xv_col, g_col, d_col,
                       w_ref, u_ref, b_ref, wh_ref,
                       S: int, h: int, cdt):
    """One LSTM cell application, tiled over the token axis.

    Updates the H/C carry scratches in place (each tile owns its rows) and
    writes delta = H_new @ W_h into ``d_col``.  Gate quarters are computed
    and consumed one at a time so at most a few (R, h) values are live.
    Numerics identical to the monolithic (S, 4h) formulation: same
    elementwise expression tree, same f32-accumulated bf16 matmuls.
    """
    R = _tile_rows(S)

    def tile(i, _):
        rows = pl.ds(i * R, R)
        xv_t = xv_col[rows]               # (R, 1)
        g_t = g_col[rows]
        H_t = H_s[rows].astype(cdt)       # the bf16 gate operand

        def pre(q):
            return (xv_t * w_ref[0:1, pl.ds(q * h, h)]
                    + g_t * w_ref[1:2, pl.ds(q * h, h)]
                    + jax.lax.dot_general(
                        H_t, u_ref[:, pl.ds(q * h, h)],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    + b_ref[:, pl.ds(q * h, h)])

        acc = _sig(pre(0)) * _tanh(pre(3))            # i * u
        C_new = acc + _sig(pre(1)) * C_s[rows]        # + f * C
        H_new = _sig(pre(2)) * _tanh(C_new)           # o * tanh(C')
        C_s[rows] = C_new
        H_s[rows] = H_new
        d_col[rows] = jax.lax.dot_general(
            H_new.astype(cdt), wh_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, S // R, tile, 0, unroll=False)


# ---------------------------------------------------------------------------
# Forward segment kernel
# ---------------------------------------------------------------------------

def _fwd_seg_kernel(tb_ref, rho_ref, alpha_ref,
                    q_ref, a0_ref, p_ref, zl_ref, zu_ref, rhom_ref,
                    x0_ref, y0_ref, z0_ref, xv0_ref, h0_ref, c0_ref,
                    w_ref, u_ref, b_ref, wh_ref, bh_ref,
                    x_out, y_out, z_out, xv_out, h_out, c_out,
                    pr_out, dr_out,
                    H, C, xv, g_col, d_col, x_r, y_r, z_r, sem,
                    *, n: int, m: int, hidden: int, J: int, sigma: float,
                    cdt=jnp.bfloat16):
    S = n + m
    b_idx = pl.program_id(0)
    Q = q_ref[0]
    A0 = a0_ref[0]
    p = p_ref[0]
    zl = zl_ref[0]
    zu = zu_ref[0]
    rhom = rhom_ref[0]
    mv_q, mv_a0, mv_a0t = _mv_maker(Q, A0, cdt)

    # recurrent state stays in HBM between segments; DMA this instance's
    # slice into the VMEM carries (windowing it would double-buffer 2x7 MB
    # per array at flagship shape).  hidden is pre-padded to a 128 multiple
    # host-side — Mosaic requires DMA slices lane-aligned.
    cp_h = pltpu.make_async_copy(h0_ref.at[b_idx], H, sem.at[0])
    cp_c = pltpu.make_async_copy(c0_ref.at[b_idx], C, sem.at[1])
    cp_h.start()
    cp_c.start()
    x_r[...] = x0_ref[0]
    y_r[...] = y0_ref[0]
    z_r[...] = z0_ref[0]
    xv[...] = xv0_ref[0]
    cp_h.wait()
    cp_c.wait()

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

        _cell_update_tiled(H, C, xv, g_col, d_col,
                           w_ref, u_ref, b_ref, wh_ref, S, hidden, cdt)
        xv[...] = xv[:] - (d_col[:] + bh_ref[:])

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
    co_h = pltpu.make_async_copy(H, h_out.at[b_idx], sem.at[0])
    co_c = pltpu.make_async_copy(C, c_out.at[b_idx], sem.at[1])
    co_h.start()
    co_c.start()
    co_h.wait()
    co_c.wait()


# ---------------------------------------------------------------------------
# Streamed-checkpoint variant (round 4, VERDICT #4)
#
# The recompute design above reruns the whole forward inside the backward
# kernel to rebuild the per-step H/C from the segment-start checkpoint —
# that recompute is ~4 of the ~20 MXU-units per trained iteration, and the
# VMEM-resident (J+1, S, h) checkpoint stacks cap J at 2 (flagship), so a
# K=100 chunk pays 50 kernel launches + state DMAs per direction.
#
# The streamed variant instead has the FORWARD kernel write every per-step
# H (staged to bf16 — the exact operand the gate matmuls consume) and C
# (f32, exact) to HBM, plus the tiny per-step iterate vectors.  The
# backward skips the forward recompute entirely and streams the
# checkpoints back through a 3-slot rolling VMEM buffer with async-copy
# prefetch.  J is then bounded by HBM (not VMEM): one kernel per direction
# per chunk at the flagship shape.  HBM cost: B*K*S*h*(2+4) bytes
# (~8.8 GB at B=8, K=100 flagship — the auto picker falls back to the
# recompute kernels when that does not fit).
# ---------------------------------------------------------------------------


def _fwd_stream_kernel(tb_ref, rho_ref, alpha_ref,
                       q_ref, a0_ref, p_ref, zl_ref, zu_ref, rhom_ref,
                       x0_ref, y0_ref, z0_ref, xv0_ref, h0_ref, c0_ref,
                       w_ref, u_ref, b_ref, wh_ref, bh_ref,
                       x_out, y_out, z_out, xv_out, h_out, c_out,
                       pr_out, dr_out,
                       hs_out, cs_out, xs_out, ys_out, zs_out, xvs_out,
                       H, C, xv, g_col, d_col, x_r, y_r, z_r,
                       Hst, Cst, sem, sem_s,
                       *, n: int, m: int, hidden: int, J: int, sigma: float,
                       cdt=jnp.bfloat16):
    S = n + m
    b_idx = pl.program_id(0)
    Q = q_ref[0]
    A0 = a0_ref[0]
    p = p_ref[0]
    zl = zl_ref[0]
    zu = zu_ref[0]
    rhom = rhom_ref[0]
    mv_q, mv_a0, mv_a0t = _mv_maker(Q, A0, cdt)

    cp_h = pltpu.make_async_copy(h0_ref.at[b_idx], H, sem.at[0])
    cp_c = pltpu.make_async_copy(c0_ref.at[b_idx], C, sem.at[1])
    cp_h.start()
    cp_c.start()
    x_r[...] = x0_ref[0]
    y_r[...] = y0_ref[0]
    z_r[...] = z0_ref[0]
    xv[...] = xv0_ref[0]
    cp_h.wait()
    cp_c.wait()

    base = b_idx * (J + 1)  # flat (B*(J+1), S, hp) checkpoint layout

    def stage_copies(k, s):
        return (pltpu.make_async_copy(Hst.at[s], hs_out.at[base + k],
                                      sem_s.at[s, 0]),
                pltpu.make_async_copy(Cst.at[s], cs_out.at[base + k],
                                      sem_s.at[s, 1]))

    def stage_and_store(k):
        """Write the PRE-step-k state to the HBM checkpoint stream (H cast
        to the bf16 gate operand, C exact f32) via double-buffered staging
        so the DMA overlaps the step compute."""
        s = k % 2

        @pl.when(k >= 2)
        def _():
            a, b_ = stage_copies(k - 2, s)
            a.wait()
            b_.wait()

        Hst[s] = H[:].astype(cdt)
        Cst[s] = C[:]
        a, b_ = stage_copies(k, s)
        a.start()
        b_.start()

    def step(k, _):
        stage_and_store(k)
        xs_out[0, pl.ds(k, 1)] = x_r[:]
        ys_out[0, pl.ds(k, 1)] = y_r[:]
        zs_out[0, pl.ds(k, 1)] = z_r[:]
        xvs_out[0, pl.ds(k, 1)] = xv[:].reshape(1, S)

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

        _cell_update_tiled(H, C, xv, g_col, d_col,
                           w_ref, u_ref, b_ref, wh_ref, S, hidden, cdt)
        xv[...] = xv[:] - (d_col[:] + bh_ref[:])

        x_t = xv[0:n, :].reshape(1, n)
        v = xv[n:S, :].reshape(1, m)
        z_t = z + (v - y) / rho_row
        x_new = alpha_t * x_t + (1.0 - alpha_t) * x
        z_new = jnp.minimum(jnp.maximum(z_t + y / rho_row, zl), zu)
        y_new = y + rho_row * (z_t - z_new)
        x_r[...] = x_new
        y_r[...] = y_new
        z_r[...] = z_new

        v1 = mv_a0(x_new) - z_new
        v2 = mv_q(x_new) + p + mv_a0t(y_new)
        pr_out[0, 0, k] = jnp.sqrt(jnp.sum(v1 * v1))
        dr_out[0, 0, k] = jnp.sqrt(jnp.sum(v2 * v2))
        return 0

    jax.lax.fori_loop(0, J, step, 0, unroll=False)

    # final (post-chunk) checkpoint at index J + drain the staging pipeline
    sJ = J % 2
    if J >= 2:
        a, b_ = stage_copies(J - 2, sJ)
        a.wait()
        b_.wait()
    Hst[sJ] = H[:].astype(cdt)
    Cst[sJ] = C[:]
    a, b_ = stage_copies(J, sJ)
    a.start()
    b_.start()
    xs_out[0, J:J + 1] = x_r[:]
    ys_out[0, J:J + 1] = y_r[:]
    zs_out[0, J:J + 1] = z_r[:]
    xvs_out[0, J:J + 1] = xv[:].reshape(1, S)
    if J >= 1:
        a, b_ = stage_copies(J - 1, (J - 1) % 2)
        a.wait()
        b_.wait()
    a, b_ = stage_copies(J, sJ)
    a.wait()
    b_.wait()

    x_out[0] = x_r[:]
    y_out[0] = y_r[:]
    z_out[0] = z_r[:]
    xv_out[0] = xv[:]
    co_h = pltpu.make_async_copy(H, h_out.at[b_idx], sem.at[0])
    co_c = pltpu.make_async_copy(C, c_out.at[b_idx], sem.at[1])
    co_h.start()
    co_c.start()
    co_h.wait()
    co_c.wait()


def _bwd_stream_kernel(tb_ref, rho_ref, alpha_ref,
                       q_ref, a0_ref, p_ref, zl_ref, zu_ref, rhom_ref,
                       w_ref, u_ref, b_ref, wh_ref, bh_ref,
                       hs_ref, cs_ref, xs_ref, ys_ref, zs_ref, xvs_ref,
                       dx_in, dy_in, dz_in, dxv_in, dh_in, dc_in,
                       dpr_ref, ddr_ref,
                       # outputs
                       dx0, dy0, dz0, dxv0, dh0, dc0,
                       dW, dU, db, dWh, dbh, drho, dalpha,
                       # scratch
                       sH, sC, H_buf, C_buf, dxv, xv_col, g_col, dg_col,
                       dx_r, dy_r, dz_r, sem, semb,
                       *, n: int, m: int, hidden: int, J: int, sigma: float,
                       cdt=jnp.bfloat16):
    """Reverse sweep over streamed checkpoints — the bstep numerics are
    IDENTICAL to ``_bwd_seg_kernel`` (bf16-as-consumed H, exact f32 C); only
    the source of the per-step states differs (HBM stream vs in-kernel
    forward recompute)."""
    S = n + m
    Q = q_ref[0]
    A0 = a0_ref[0]
    p = p_ref[0]
    zl = zl_ref[0]
    zu = zu_ref[0]
    rhom = rhom_ref[0]
    mv_q, mv_a0, mv_a0t = _mv_maker(Q, A0, cdt)
    h = hidden
    R = _tile_rows(S)
    b_idx = pl.program_id(0)
    base = b_idx * (J + 1)

    @pl.when(b_idx == 0)
    def _():
        dW[...] = jnp.zeros_like(dW)
        dU[...] = jnp.zeros_like(dU)
        db[...] = jnp.zeros_like(db)
        dWh[...] = jnp.zeros_like(dWh)
        dbh[...] = jnp.zeros_like(dbh)

        def zero_sched(i, _):
            drho[0, i] = 0.0
            dalpha[0, i] = 0.0
            return 0

        jax.lax.fori_loop(0, J, zero_sched, 0, unroll=True)

    def load_copies(k):
        s = k % 3
        return (pltpu.make_async_copy(hs_ref.at[base + k], H_buf.at[s],
                                      semb.at[s, 0]),
                pltpu.make_async_copy(cs_ref.at[base + k], C_buf.at[s],
                                      semb.at[s, 1]))

    # prime the rolling buffer with checkpoints J and J-1
    aJ, bJ = load_copies(J)
    aJ.start()
    bJ.start()
    if J >= 1:
        a1, b1 = load_copies(J - 1)
        a1.start()
        b1.start()
    aJ, bJ = load_copies(J)
    aJ.wait()
    bJ.wait()

    cp_h = pltpu.make_async_copy(dh_in.at[b_idx], sH, sem.at[0])
    cp_c = pltpu.make_async_copy(dc_in.at[b_idx], sC, sem.at[1])
    cp_h.start()
    cp_c.start()
    dx_r[...] = dx_in[0]
    dy_r[...] = dy_in[0]
    dz_r[...] = dz_in[0]
    dxv[...] = dxv_in[0]
    cp_h.wait()
    cp_c.wait()

    def bstep(kk, _):
        k = J - 1 - kk
        # checkpoint k was started in step k+1 (or the prime); wait it,
        # then prefetch k-1 into the third slot while this step computes.
        a, b_ = load_copies(k)
        a.wait()
        b_.wait()

        @pl.when(k >= 1)
        def _():
            a, b_ = load_copies(k - 1)
            a.start()
            b_.start()

        t = tb_ref[0, 0] + k
        rho_raw = rho_ref[0, t]
        alpha_raw = alpha_ref[0, t]
        rho_t = _sig(rho_raw)
        alpha_t = 2.0 * _sig(alpha_raw)
        rho_row = rho_t * rhom

        x = xs_ref[0, pl.ds(k, 1)]
        y = ys_ref[0, pl.ds(k, 1)]
        z = zs_ref[0, pl.ds(k, 1)]
        xv_row = xvs_ref[0, pl.ds(k, 1)]          # (1, S)
        xv_new = xvs_ref[0, pl.ds(k + 1, 1)]      # (1, S)
        x_new = xs_ref[0, pl.ds(k + 1, 1)]
        y_new = ys_ref[0, pl.ds(k + 1, 1)]
        z_new = zs_ref[0, pl.ds(k + 1, 1)]
        xv_col[...] = xv_row.reshape(S, 1)        # column form for the tiles

        u_row = xv_row[:, 0:n]
        nu_row = xv_row[:, n:S]
        x_t = xv_new[:, 0:n]
        v = xv_new[:, n:S]
        z_t = z + (v - y) / rho_row
        w_clip = z_t + y / rho_row
        mask = jnp.logical_and(w_clip >= zl, w_clip <= zu
                               ).astype(jnp.float32)

        b1 = sigma * x - p
        r1 = mv_q(u_row) + sigma * u_row + mv_a0t(nu_row) - b1
        r2 = mv_a0(u_row) - (nu_row - y) / rho_row - z

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

        drho_vec = dyn * (z_t - z_new)
        dz_t = rho_row * dyn
        dznn = -rho_row * dyn + dzn
        dw = dznn * mask
        dz_t = dz_t + dw
        dy = dyn + dw / rho_row
        drho_vec = drho_vec - dw * y / (rho_row * rho_row)
        dxt = alpha_t * dxn
        dx = (1.0 - alpha_t) * dxn
        dalpha_s = jnp.sum(dxn * (x_t - x))
        dz = dz_t
        dv_ = dz_t / rho_row
        dy = dy - dz_t / rho_row
        drho_vec = drho_vec - dz_t * (v - y) / (rho_row * rho_row)

        dxv[...] = dxv[:] + jnp.concatenate(
            [dxt.reshape(n, 1), dv_.reshape(m, 1)], axis=0)
        dbh[...] += jnp.sum(-dxv[:], axis=0, keepdims=True)

        g_q1 = mv_q(r1) + sigma * r1 + mv_a0t(r2)
        g_q2 = mv_a0(r1) - r2 / rho_row
        g_col[0:n, :] = g_q1.reshape(n, 1)
        g_col[n:S, :] = g_q2.reshape(m, 1)

        def tile(i, _):
            rows = pl.ds(i * R, R)
            ddel_t = -dxv[rows]
            xv_t = xv_col[rows]
            g_t = g_col[rows]
            H_k_t = H_buf[k % 3, rows]             # bf16 (R, h)
            C_k_t = C_buf[k % 3, rows]
            C_new_t = C_buf[(k + 1) % 3, rows]
            tC = _tanh(C_new_t)

            dH_new = sH[rows] + jax.lax.dot_general(
                ddel_t.astype(cdt), wh_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dWh[...] += jax.lax.dot_general(
                H_buf[(k + 1) % 3, rows], ddel_t.astype(cdt),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

            def pre(q):
                return (xv_t * w_ref[0:1, pl.ds(q * h, h)]
                        + g_t * w_ref[1:2, pl.ds(q * h, h)]
                        + jax.lax.dot_general(
                            H_k_t, u_ref[:, pl.ds(q * h, h)],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        + b_ref[:, pl.ds(q * h, h)])

            dxv_q = jnp.zeros_like(ddel_t)
            dg_q = jnp.zeros_like(ddel_t)
            dH_acc = jnp.zeros_like(dH_new)

            def contract(q, dpre):
                nonlocal dxv_q, dg_q, dH_acc
                dpre_b = dpre.astype(cdt)
                dU[:, pl.ds(q * h, h)] += jax.lax.dot_general(
                    H_k_t, dpre_b, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                db[:, pl.ds(q * h, h)] += jnp.sum(dpre, axis=0,
                                                  keepdims=True)
                dW[0:1, pl.ds(q * h, h)] += jnp.sum(xv_t * dpre, axis=0,
                                                    keepdims=True)
                dW[1:2, pl.ds(q * h, h)] += jnp.sum(g_t * dpre, axis=0,
                                                    keepdims=True)
                dH_acc = dH_acc + jax.lax.dot_general(
                    dpre_b, u_ref[:, pl.ds(q * h, h)],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dxv_q = dxv_q + jnp.sum(dpre * w_ref[0:1, pl.ds(q * h, h)],
                                        axis=1, keepdims=True)
                dg_q = dg_q + jnp.sum(dpre * w_ref[1:2, pl.ds(q * h, h)],
                                      axis=1, keepdims=True)

            o_t = _sig(pre(2))
            do = dH_new * tC
            dC_new = sC[rows] + dH_new * o_t * (1.0 - tC * tC)
            contract(2, do * o_t * (1.0 - o_t))
            i_t = _sig(pre(0))
            u_t = _tanh(pre(3))
            contract(0, (dC_new * u_t) * i_t * (1.0 - i_t))
            contract(3, (dC_new * i_t) * (1.0 - u_t * u_t))
            f_t = _sig(pre(1))
            contract(1, (dC_new * C_k_t) * f_t * (1.0 - f_t))
            sC[rows] = dC_new * f_t
            sH[rows] = dH_acc
            dxv[rows] += dxv_q
            dg_col[rows] = dg_q
            return 0

        jax.lax.fori_loop(0, S // R, tile, 0, unroll=False)

        dg1 = dg_col[0:n, :].reshape(1, n)
        dg2 = dg_col[n:S, :].reshape(1, m)
        drho_vec = drho_vec + dg2 * r2 / (rho_row * rho_row)
        dr1 = mv_q(dg1) + sigma * dg1 + mv_a0t(dg2)
        dr2 = mv_a0(dg1) - dg2 / rho_row
        du_ = mv_q(dr1) + sigma * dr1 + mv_a0t(dr2)
        dnu = mv_a0(dr1) - dr2 / rho_row
        dx = dx - sigma * dr1
        dy = dy + dr2 / rho_row
        dz = dz - dr2
        drho_vec = drho_vec + dr2 * (nu_row - y) / (rho_row * rho_row)

        dxv[0:n, :] += du_.reshape(n, 1)
        dxv[n:S, :] += dnu.reshape(m, 1)
        dx_r[...] = dx
        dy_r[...] = dy
        dz_r[...] = dz

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
    co_h = pltpu.make_async_copy(sH, dh0.at[b_idx], sem.at[0])
    co_c = pltpu.make_async_copy(sC, dc0.at[b_idx], sem.at[1])
    co_h.start()
    co_c.start()
    co_h.wait()
    co_c.wait()


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
                    sH, sC, dxv, xv_col, g_col, dg_col,
                    dx_r, dy_r, dz_r, sem,
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
    R = _tile_rows(S)
    b_idx = pl.program_id(0)

    # ---- forward recompute sweep: store pre-step states (H as the cdt
    # operand the gate matmuls consume, C in f32; vectors are cheap).
    # sH/sC serve as the H/C carries here and become the dH/dC reverse
    # carries afterwards (disjoint live ranges, same 7 MB buffers). ----
    cp_h = pltpu.make_async_copy(h0_ref.at[b_idx], sH, sem.at[0])
    cp_c = pltpu.make_async_copy(c0_ref.at[b_idx], sC, sem.at[1])
    cp_h.start()
    cp_c.start()
    xs[0] = x0_ref[0]
    ys[0] = y0_ref[0]
    zs[0] = z0_ref[0]
    xvs[0] = xv0_ref[0]
    cp_h.wait()
    cp_c.wait()

    def fstep(k, _):
        t = tb_ref[0, 0] + k
        rho_t = _sig(rho_ref[0, t])
        alpha_t = 2.0 * _sig(alpha_ref[0, t])
        rho_row = rho_t * rhom
        Hs[k] = sH[:].astype(cdt)
        Cs[k] = sC[:]
        x = xs[k]
        y = ys[k]
        z = zs[k]
        xv_col[...] = xvs[k]
        u_row = xv_col[0:n, :].reshape(1, n)
        nu_row = xv_col[n:S, :].reshape(1, m)
        b1 = sigma * x - p
        r1 = mv_q(u_row) + sigma * u_row + mv_a0t(nu_row) - b1
        r2 = mv_a0(u_row) - (nu_row - y) / rho_row - z
        g1 = mv_q(r1) + sigma * r1 + mv_a0t(r2)
        g2 = mv_a0(r1) - r2 / rho_row
        g_col[0:n, :] = g1.reshape(n, 1)
        g_col[n:S, :] = g2.reshape(m, 1)

        _cell_update_tiled(sH, sC, xv_col, g_col, dg_col,
                           w_ref, u_ref, b_ref, wh_ref, S, h, cdt)
        xv_new = xv_col[:] - (dg_col[:] + bh_ref[:])
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
    Hs[J] = sH[:].astype(cdt)
    Cs[J] = sC[:]

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

    cp_h = pltpu.make_async_copy(dh_in.at[b_idx], sH, sem.at[0])
    cp_c = pltpu.make_async_copy(dc_in.at[b_idx], sC, sem.at[1])
    cp_h.start()
    cp_c.start()
    dx_r[...] = dx_in[0]
    dy_r[...] = dy_in[0]
    dz_r[...] = dz_in[0]
    dxv[...] = dxv_in[0]
    cp_h.wait()
    cp_c.wait()

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
        # dxv scratch := dxv_new; tiles then add their per-row gate terms.
        dxv[...] = dxv[:] + jnp.concatenate(
            [dxt.reshape(n, 1), dv_.reshape(m, 1)], axis=0)
        dbh[...] += jnp.sum(-dxv[:], axis=0, keepdims=True)

        # recompute the KKT feature column for this step (gate input)
        g_q1 = mv_q(r1) + sigma * r1 + mv_a0t(r2)
        g_q2 = mv_a0(r1) - r2 / rho_row
        g_col[0:n, :] = g_q1.reshape(n, 1)
        g_col[n:S, :] = g_q2.reshape(m, 1)

        # Token-tiled gate backward: one quarter live at a time, weight
        # grads contracted per tile, the recurrent cotangents written back
        # into sH/sC (each tile owns its rows).
        def tile(i, _):
            rows = pl.ds(i * R, R)
            ddel_t = -dxv[rows]                    # ddelta rows (R, 1)
            xv_t = xvs[k, rows]
            g_t = g_col[rows]
            H_k_t = Hs[k, rows]                    # bf16 (R, h)
            C_k_t = Cs[k, rows]
            C_new_t = Cs[k + 1, rows]
            tC = _tanh(C_new_t)

            # delta = H' @ W_h + b_h
            dH_new = sH[rows] + jax.lax.dot_general(
                ddel_t.astype(cdt), wh_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dWh[...] += jax.lax.dot_general(
                Hs[k + 1, rows], ddel_t.astype(cdt), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

            def pre(q):
                return (xv_t * w_ref[0:1, pl.ds(q * h, h)]
                        + g_t * w_ref[1:2, pl.ds(q * h, h)]
                        + jax.lax.dot_general(
                            H_k_t, u_ref[:, pl.ds(q * h, h)],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        + b_ref[:, pl.ds(q * h, h)])

            dxv_q = jnp.zeros_like(ddel_t)
            dg_q = jnp.zeros_like(ddel_t)
            dH_acc = jnp.zeros_like(dH_new)

            def contract(q, dpre):
                nonlocal dxv_q, dg_q, dH_acc
                dpre_b = dpre.astype(cdt)
                dU[:, pl.ds(q * h, h)] += jax.lax.dot_general(
                    H_k_t, dpre_b, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                db[:, pl.ds(q * h, h)] += jnp.sum(dpre, axis=0,
                                                  keepdims=True)
                dW[0:1, pl.ds(q * h, h)] += jnp.sum(xv_t * dpre, axis=0,
                                                    keepdims=True)
                dW[1:2, pl.ds(q * h, h)] += jnp.sum(g_t * dpre, axis=0,
                                                    keepdims=True)
                dH_acc = dH_acc + jax.lax.dot_general(
                    dpre_b, u_ref[:, pl.ds(q * h, h)],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dxv_q = dxv_q + jnp.sum(dpre * w_ref[0:1, pl.ds(q * h, h)],
                                        axis=1, keepdims=True)
                dg_q = dg_q + jnp.sum(dpre * w_ref[1:2, pl.ds(q * h, h)],
                                      axis=1, keepdims=True)

            # H' = o * tanh(C'); C' = i*u + f*C — quarters sequenced so at
            # most two (R, h) activations are live at once.
            o_t = _sig(pre(2))
            do = dH_new * tC
            dC_new = sC[rows] + dH_new * o_t * (1.0 - tC * tC)
            contract(2, do * o_t * (1.0 - o_t))
            i_t = _sig(pre(0))
            u_t = _tanh(pre(3))
            contract(0, (dC_new * u_t) * i_t * (1.0 - i_t))
            contract(3, (dC_new * i_t) * (1.0 - u_t * u_t))
            f_t = _sig(pre(1))
            contract(1, (dC_new * C_k_t) * f_t * (1.0 - f_t))
            sC[rows] = dC_new * f_t
            sH[rows] = dH_acc
            dxv[rows] += dxv_q
            dg_col[rows] = dg_q
            return 0

        jax.lax.fori_loop(0, S // R, tile, 0, unroll=False)

        # ---- KKT feature backward ----
        dg1 = dg_col[0:n, :].reshape(1, n)
        dg2 = dg_col[n:S, :].reshape(1, m)
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

        dxv[0:n, :] += du_.reshape(n, 1)
        dxv[n:S, :] += dnu.reshape(m, 1)
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
    co_h = pltpu.make_async_copy(sH, dh0.at[b_idx], sem.at[0])
    co_c = pltpu.make_async_copy(sC, dc0.at[b_idx], sem.at[1])
    co_h.start()
    co_c.start()
    co_h.wait()
    co_c.wait()


# ---------------------------------------------------------------------------
# Host-side wrappers: padding, pallas_call builders, segment scan, custom VJP
# ---------------------------------------------------------------------------

def pick_segment_len(n_pad: int, m_pad: int, hidden: int, chunk_len: int,
                     budget: float = 110e6) -> int:
    """Largest divisor of chunk_len whose backward-kernel VMEM estimate fits
    the budget (see module docstring for the buffer inventory)."""
    S = n_pad + m_pad
    hp = _round_up(hidden, 128)
    R = _tile_rows(S)
    fixed = (4 * (n_pad * n_pad + m_pad * n_pad)   # Q, A0 bf16 2x-buffered
             + 2 * hp * 4 * hidden                 # U bf16
             + 4 * hp * 4 * hidden                 # dU f32 output window
             + 2 * S * hp * 4                      # sH, sC carries f32
             + 8 * S * 128 * 4                     # (S,1) lane-padded cols
             + 10 * R * hp * 4)                    # tile-loop live values
    per_j = S * hp * (2 + 4) + S * 128 * 4         # Hs bf16 + Cs f32 + xvs
    best = 1
    for j in range(1, min(chunk_len, 16) + 1):
        if chunk_len % j == 0 and fixed + (j + 1) * per_j <= budget:
            best = j
    return best


def _pad_axis(a, size, axis, fill=0.0):
    pad = [(0, 0)] * a.ndim
    pad[axis] = (0, size - a.shape[axis])
    return jnp.pad(a, pad, constant_values=fill)


def _pad_q(a, h: int, hp: int):
    """Zero-pad each of the 4 gate blocks of the last (4h) axis to hp wide,
    so in-kernel quarter slices land at 128-aligned lane offsets and the
    HBM-resident H/C can be DMA-ed (Mosaic requires lane-aligned slices).
    The pad algebra is inert: pad gate columns stay sigma(0)/tanh(0) and
    the pad H/C columns stay exactly zero through the cell update."""
    if hp == h:
        return a
    pad = [(0, 0)] * (a.ndim - 1) + [(0, hp - h)]
    return jnp.concatenate([jnp.pad(a[..., q * h:(q + 1) * h], pad)
                            for q in range(4)], axis=-1)


def _unpad_q(a, h: int, hp: int):
    if hp == h:
        return a
    return jnp.concatenate([a[..., q * hp:q * hp + h] for q in range(4)],
                           axis=-1)


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


def _pack_state(st: IterState, n_true: int, n: int, m: int, hp: int):
    """Split the (n_true+m_true) token axis, re-pad each block, and pad the
    hidden axis of H/C to the lane-aligned hp."""
    def tok(a):
        top = _pad_axis(a[:, :n_true], n, 1)
        bot = _pad_axis(a[:, n_true:], m, 1)
        return jnp.concatenate([top, bot], axis=1).astype(jnp.float32)

    x = _pad_axis(st.x, n, 1).astype(jnp.float32)[:, None]
    y = _pad_axis(st.y, m, 1).astype(jnp.float32)[:, None]
    z = _pad_axis(st.z, m, 1).astype(jnp.float32)[:, None]
    xv = tok(st.xv)[..., None]
    H = _pad_axis(tok(st.H), hp, 2)
    C = _pad_axis(tok(st.C), hp, 2)
    return x, y, z, xv, H, C


def _unpack_state(t, n_true: int, m_true: int, n: int,
                  hidden: int) -> IterState:
    x, y, z, xv, H, C = t
    S0 = n + m_true

    def untok(a):
        return jnp.concatenate([a[:, :n_true], a[:, n:S0]], axis=1)

    return IterState(x=x[:, 0, :n_true], y=y[:, 0, :m_true],
                     z=z[:, 0, :m_true], xv=untok(xv[..., 0]),
                     H=untok(H)[..., :hidden], C=untok(C)[..., :hidden])


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
    any_ = pl.BlockSpec(memory_space=pl.ANY)
    sched = [smem(1, 1), smem(1, K_total), smem(1, K_total)]
    dat = [inst3(n, n), inst3(m, n), inst3(1, n), inst3(1, m), inst3(1, m),
           inst3(1, m)]
    # state tuple order (x, y, z, xv, H, C): the small per-instance rows
    # and the (S,1) xv column ride the grid pipeline; H/C stay HBM-resident
    # (pl.ANY) and are DMA-ed in-kernel — windowing them would
    # double-buffer ~56 MB at flagship shape.
    state = [inst3(1, n), inst3(1, m), inst3(1, m), inst3(S, 1), any_, any_]
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
            pltpu.VMEM((S, 1), jnp.float32),        # delta
            pltpu.VMEM((1, n), jnp.float32),        # x
            pltpu.VMEM((1, m), jnp.float32),        # y
            pltpu.VMEM((1, m), jnp.float32),        # z
            pltpu.SemaphoreType.DMA((3,)),
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
            pltpu.VMEM((S, hidden), jnp.float32),          # sH: H then dH
            pltpu.VMEM((S, hidden), jnp.float32),          # sC: C then dC
            pltpu.VMEM((S, 1), jnp.float32),               # dxv
            pltpu.VMEM((S, 1), jnp.float32),               # xv_col
            pltpu.VMEM((S, 1), jnp.float32),               # g_col
            pltpu.VMEM((S, 1), jnp.float32),               # dg / delta
            pltpu.VMEM((1, n), jnp.float32),               # dx
            pltpu.VMEM((1, m), jnp.float32),               # dy
            pltpu.VMEM((1, m), jnp.float32),               # dz
            pltpu.SemaphoreType.DMA((3,)),
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


def _seq_specs(B, n, m, S, J):
    """Per-step iterate-vector streams: VMEM-windowed per instance.  Stored
    as (B, J+1, len) ROW layouts — a trailing singleton dim would be padded
    to 128 lanes by Mosaic (a 212 MB window at flagship, AOT-verified)."""
    def seq(d2):
        return pl.BlockSpec((1, J + 1, d2), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    return [seq(n), seq(m), seq(m), seq(S)]


def _seq_shapes(B, n, m, S, J):
    f32 = jnp.float32
    return [jax.ShapeDtypeStruct((B, J + 1, n), f32),
            jax.ShapeDtypeStruct((B, J + 1, m), f32),
            jax.ShapeDtypeStruct((B, J + 1, m), f32),
            jax.ShapeDtypeStruct((B, J + 1, S), f32)]


def _make_fwd_stream_call(B, n, m, hidden, J, K_total, sigma, interpret,
                          cdt=jnp.bfloat16):
    S = n + m
    sched, dat, state, weights, inst3, shared, smem, smem_i = _specs(
        B, n, m, hidden, J, K_total)
    any_ = pl.BlockSpec(memory_space=pl.ANY)
    kernel = functools.partial(_fwd_stream_kernel, n=n, m=m, hidden=hidden,
                               J=J, sigma=float(sigma), cdt=cdt)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=sched + dat + state + weights,
        out_specs=[*state, smem_i(1, J), smem_i(1, J),
                   any_, any_, *_seq_specs(B, n, m, S, J)],
        out_shape=[*_state_shapes(B, n, m, hidden),
                   jax.ShapeDtypeStruct((B, 1, J), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1, J), jnp.float32),
                   jax.ShapeDtypeStruct((B * (J + 1), S, hidden), cdt),
                   jax.ShapeDtypeStruct((B * (J + 1), S, hidden),
                                        jnp.float32),
                   *_seq_shapes(B, n, m, S, J)],
        scratch_shapes=[
            pltpu.VMEM((S, hidden), jnp.float32),   # H
            pltpu.VMEM((S, hidden), jnp.float32),   # C
            pltpu.VMEM((S, 1), jnp.float32),        # xv
            pltpu.VMEM((S, 1), jnp.float32),        # g
            pltpu.VMEM((S, 1), jnp.float32),        # delta
            pltpu.VMEM((1, n), jnp.float32),        # x
            pltpu.VMEM((1, m), jnp.float32),        # y
            pltpu.VMEM((1, m), jnp.float32),        # z
            pltpu.VMEM((2, S, hidden), cdt),        # Hst staging
            pltpu.VMEM((2, S, hidden), jnp.float32),  # Cst staging
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * J * (S * (hidden + 2) * 4 * hidden
                               + 7 * (n * n + 2 * m * n)),
            bytes_accessed=2 * B * (n * n + m * n)
            + B * J * S * hidden * 6,
            transcendentals=5 * B * J * S * hidden),
        interpret=interpret,
    )


def _make_bwd_stream_call(B, n, m, hidden, J, K_total, sigma, interpret,
                          cdt=jnp.bfloat16):
    S = n + m
    sched, dat, state, weights, inst3, shared, smem, smem_i = _specs(
        B, n, m, hidden, J, K_total)
    any_ = pl.BlockSpec(memory_space=pl.ANY)
    kernel = functools.partial(_bwd_stream_kernel, n=n, m=m, hidden=hidden,
                               J=J, sigma=float(sigma), cdt=cdt)
    f32 = jnp.float32
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=(sched + dat + weights
                  + [any_, any_, *_seq_specs(B, n, m, S, J)]
                  + state                      # d(state_out) cotangents
                  + [smem_i(1, J), smem_i(1, J)]),
        out_specs=[*state,
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
            pltpu.VMEM((S, hidden), jnp.float32),          # sH -> dH carry
            pltpu.VMEM((S, hidden), jnp.float32),          # sC -> dC carry
            pltpu.VMEM((3, S, hidden), cdt),               # H rolling buffer
            pltpu.VMEM((3, S, hidden), jnp.float32),       # C rolling buffer
            pltpu.VMEM((S, 1), jnp.float32),               # dxv
            pltpu.VMEM((S, 1), jnp.float32),               # xv_col staging
            pltpu.VMEM((S, 1), jnp.float32),               # g_col
            pltpu.VMEM((S, 1), jnp.float32),               # dg / delta
            pltpu.VMEM((1, n), jnp.float32),               # dx
            pltpu.VMEM((1, m), jnp.float32),               # dy
            pltpu.VMEM((1, m), jnp.float32),               # dz
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SemaphoreType.DMA((3, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=6 * B * J * (S * (hidden + 2) * 4 * hidden
                               + 7 * (n * n + 2 * m * n)),
            bytes_accessed=2 * B * (n * n + m * n)
            + B * J * S * hidden * 6,
            transcendentals=8 * B * J * S * hidden),
        interpret=interpret,
    )


def make_fused_chunk_loss(*, num_var: int, num_constr: int, batch: int,
                          hidden: int, sigma: float, chunk_len: int,
                          outer_T: int, K_total: int,
                          interpret: bool = False, seg: int = 0,
                          compute_dtype: str = "bfloat16", mesh=None,
                          stream=None):
    """Build a drop-in for ``rollouts.chunk_loss`` backed by the fused
    training megakernel: ``fn(params, state, data, t0) -> (loss, state')``.

    Loss numerics follow ``chunk_loss`` with ``loss_mode='bf16'`` (the
    resident matrices are bf16).  Differentiates w.r.t. params only.

    ``stream``: use the streamed-checkpoint kernel pair (forward writes the
    per-step H/C to HBM; backward skips the forward recompute — see the
    module banner above ``_fwd_stream_kernel``).  ``None`` = auto: stream
    when the whole-chunk checkpoint stack fits the HBM budget
    (``IADMM_STREAM_HBM`` env, default 10 GB) and no explicit ``seg`` was
    requested.  Numerics are identical either way (bf16-as-consumed H,
    exact f32 C).

    ``mesh``: a ``('data',)`` mesh makes the returned fn data-parallel via
    ``shard_map`` — each device runs the kernel on its shard of the
    instance batch (``batch`` here is the PER-DEVICE batch), the chunk loss
    is ``pmean``-ed over 'data', and shard_map's transpose inserts the
    gradient all-reduce over ICI (SURVEY.md §2.4 DP row).
    """
    import os
    import numpy as np

    n = _round_up(num_var, 128)
    m = _round_up(num_constr, 128)
    hp = _round_up(hidden, 128)
    B = batch
    cdt = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    ckpt_bytes = B * (chunk_len + 1) * (n + m) * hp * 6
    if stream is None:
        budget = float(os.environ.get("IADMM_STREAM_HBM", 10e9))
        stream = seg == 0 and ckpt_bytes <= budget
    if stream:
        J = chunk_len
        n_segs = 1
        fwd_call = _make_fwd_stream_call(B, n, m, hp, J, K_total, sigma,
                                         interpret, cdt)
        bwd_call = _make_bwd_stream_call(B, n, m, hp, J, K_total, sigma,
                                         interpret, cdt)
    else:
        J = seg or pick_segment_len(n, m, hidden, chunk_len)
        n_segs = chunk_len // J
        fwd_call = _make_fwd_call(B, n, m, hp, J, K_total, sigma, interpret,
                                  cdt)
        bwd_call = _make_bwd_call(B, n, m, hp, J, K_total, sigma, interpret,
                                  cdt)

    def _padded_weights(params):
        W = _pad_q(params["W"], hidden, hp).astype(cdt)
        U = _pad_q(_pad_axis(params["U"], hp, 0), hidden, hp).astype(cdt)
        b2 = _pad_q(params["b"].reshape(1, -1), hidden,
                    hp).astype(jnp.float32)
        Wh = _pad_axis(params["W_h"], hp, 0).astype(cdt)
        bh2 = params["b_h"].reshape(1, -1).astype(jnp.float32)
        return W, U, b2, Wh, bh2

    def _run_fwd(params, state_t, data_t, t0):
        W, U, b2, Wh, bh2 = _padded_weights(params)
        rho = params["rho"].reshape(1, -1).astype(jnp.float32)
        alpha = params["alpha"].reshape(1, -1).astype(jnp.float32)

        if stream:
            tb = t0.reshape(1, 1).astype(jnp.int32)
            out = fwd_call(tb, rho, alpha, *data_t, *state_t,
                           W, U, b2, Wh, bh2)
            final = tuple(out[:6])
            pr, dr = out[6][:, 0, :], out[7][:, 0, :]
            seqs = tuple(out[8:14])   # hs, cs, xs, ys, zs, xvs
            return pr, dr, final, seqs

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
        W, U, b2, Wh, bh2 = _padded_weights(params)
        rho = params["rho"].reshape(1, -1).astype(jnp.float32)
        alpha = params["alpha"].reshape(1, -1).astype(jnp.float32)

        if stream:
            tb = t0.reshape(1, 1).astype(jnp.int32)
            out = bwd_call(tb, rho, alpha, *data_t, W, U, b2, Wh, bh2,
                           *ckpts, *dfinal,
                           dpr.reshape(B, 1, J).astype(jnp.float32),
                           ddr.reshape(B, 1, J).astype(jnp.float32))
            dstate0 = tuple(out[:6])
            dW, dU_, db_, dWh, dbh = out[6:11]
            drho_chunk = out[11].reshape(chunk_len)
            dalpha_chunk = out[12].reshape(chunk_len)
            return _package_grads(params, state_t, data_t, t0, dW, dU_,
                                  db_, dWh, dbh, drho_chunk, dalpha_chunk)

        g0 = (jnp.zeros((2, 4 * hp)), jnp.zeros((hp, 4 * hp)),
              jnp.zeros((1, 4 * hp)), jnp.zeros((hp, 1)), jnp.zeros((1, 1)))
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
        return _package_grads(params, state_t, data_t, t0, dW, dU_, db_,
                              dWh, dbh, drho_chunk, dalpha_chunk)

    def _package_grads(params, state_t, data_t, t0, dW, dU_, db_, dWh, dbh,
                       drho_chunk, dalpha_chunk):
        dW = _unpad_q(dW, hidden, hp)
        dU_ = _unpad_q(dU_, hidden, hp)[:hidden]
        db_ = _unpad_q(db_, hidden, hp)
        dWh = dWh[:hidden]
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
        state_t = _pack_state(state, num_var, n, m, hp)
        t0 = jnp.asarray(t0, jnp.int32)
        pr, dr, final = rollout_chunk(params, state_t, data_t, t0)
        loss = (pr + dr).mean(axis=0).sum() / outer_T
        return loss, _unpack_state(final, num_var, num_constr, n, hidden)

    fused_chunk_loss.segment_len = J
    fused_chunk_loss.stream = stream
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
    dp_chunk_loss.stream = stream
    return dp_chunk_loss
