"""Whole-rollout Pallas megakernel: K learned ADMM iterations per kernel.

The per-step kernel (:mod:`lstm_cell`) still pays, every iteration, the
HBM round trip of the recurrent state (H, C) and the XLA-side KKT feature
matvecs re-reading Q/A0 from HBM.  This kernel runs the ENTIRE K-iteration
rollout for one instance per grid step with everything VMEM-resident:

  grid = (B,)
  per instance: Q (bf16), A0 (bf16) fetched once; H/C/xv/x/y/z live in
  scratch; per iteration:
    1. KKT feature  g = Ã(Ã xv − b̃) via row-vector matvecs against the
       resident Q/A0 (Ã never materialized; Q symmetric);
    2. token-tile loop: fused LSTM cell (bf16 MXU gates, f32 accumulate,
       manual exp activations), xv ← xv − Δ in place;
    3. OSQP-style x/z/y updates with the learned ρ_t (SMEM schedule) and
       α_t, z-relaxation disabled (reference: models/lstm.py:60-96).

HBM traffic for the whole rollout is one read of the problem data + one
write of the result — the rollout is compute-bound on the MXU.  This is
the inference/serving path (bench + make_solver); training uses the
per-step kernel whose custom VJP provides gradients.

Numerics: bf16 matvecs + bf16 gates with f32 accumulation — matches the
``matvec_mode='bf16', gate_dtype='bfloat16'`` fast profile of the step
path to within bf16 rounding.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..solvers.step import RHO_EQ_OVER_RHO_INEQ
from ..types import QPBatch

TOKEN_TILE = 512


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _sig(v):
    return 1.0 / (1.0 + jnp.exp(-v))


def _tanh(v):
    return 2.0 / (1.0 + jnp.exp(-2.0 * v)) - 1.0


def _rollout_kernel(rho_ref, alpha_ref,                       # SMEM (1, K)
                    q_ref, a0_ref, p_ref, zl_ref, zu_ref, rhom_ref,
                    w_ref, u_ref, b_ref, wh_ref, bh_ref,
                    x_out, y_out, z_out,
                    H, C, xv, g_col, x_r, y_r, z_r,
                    *, n: int, m: int, hidden: int, K: int, TS: int,
                    sigma: float):
    S = n + m
    Q = q_ref[0]      # (n, n) bf16, VMEM-resident
    A0 = a0_ref[0]    # (m, n) bf16
    p = p_ref[0]      # (1, n) f32   [arrays carried as (B, 1, d)]
    zl = zl_ref[0]
    zu = zu_ref[0]
    rhom = rhom_ref[0]  # (1, m) eq-row multiplier

    H[...] = jnp.zeros_like(H)
    C[...] = jnp.zeros_like(C)
    xv[...] = jnp.zeros_like(xv)
    x_r[...] = jnp.zeros_like(x_r)
    y_r[...] = jnp.zeros_like(y_r)
    z_r[...] = jnp.zeros_like(z_r)

    def mv_q(v_row):        # (1,n) @ Q (sym) -> (1,n), bf16 MXU f32 acc
        return jax.lax.dot_general(
            v_row.astype(jnp.bfloat16), Q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def mv_a0(v_row):       # A0 v: (1,n) contract A0's n axis -> (1,m)
        return jax.lax.dot_general(
            v_row.astype(jnp.bfloat16), A0, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    def mv_a0t(v_row):      # A0^T v: (1,m) contract A0's m axis -> (1,n)
        return jax.lax.dot_general(
            v_row.astype(jnp.bfloat16), A0, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def step(k, _):
        rho_t = _sig(rho_ref[0, k])
        alpha_t = 2.0 * _sig(alpha_ref[0, k])
        rho_row = rho_t * rhom                      # (1, m)

        x = x_r[:]
        y = y_r[:]
        z = z_r[:]
        u_row = xv[0:n, :].reshape(1, n)            # (n,1)->(1,n) relayout
        nu_row = xv[n:S, :].reshape(1, m)

        # r = Ã xv − b̃, blockwise (solvers/step.py algebra)
        b1 = sigma * x - p
        b2 = z - y / rho_row
        r1 = mv_q(u_row) + sigma * u_row + mv_a0t(nu_row) - b1
        r2 = mv_a0(u_row) - nu_row / rho_row - b2
        g1 = mv_q(r1) + sigma * r1 + mv_a0t(r2)
        g2 = mv_a0(r1) - r2 / rho_row
        g_col[0:n, :] = g1.reshape(n, 1)
        g_col[n:S, :] = g2.reshape(m, 1)

        # fused LSTM cell over token tiles; xv updated in place
        def tile_body(t, _):
            ts = t * TS
            xv_t = xv[pl.ds(ts, TS), :]             # (TS, 1)
            g_t = g_col[pl.ds(ts, TS), :]
            Ht = H[pl.ds(ts, TS), :]
            Ct = C[pl.ds(ts, TS), :]
            gates_h = jax.lax.dot_general(
                Ht, u_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            gates = (xv_t * w_ref[0:1, :] + g_t * w_ref[1:2, :]
                     + gates_h + b_ref[:])
            h = hidden
            i_t = _sig(gates[:, 0 * h:1 * h])
            f_t = _sig(gates[:, 1 * h:2 * h])
            o_t = _sig(gates[:, 2 * h:3 * h])
            u_t = _tanh(gates[:, 3 * h:4 * h])
            C_new = i_t * u_t + f_t * Ct
            H_new = o_t * _tanh(C_new)
            delta = jax.lax.dot_general(
                H_new.astype(jnp.bfloat16), wh_ref[:],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) + bh_ref[:]
            H[pl.ds(ts, TS), :] = H_new.astype(H.dtype)
            C[pl.ds(ts, TS), :] = C_new
            xv[pl.ds(ts, TS), :] = xv_t - delta
            return 0

        jax.lax.fori_loop(0, (n + m + TS - 1) // TS, tile_body, 0,
                          unroll=False)

        # OSQP-style updates (z-relaxation disabled in the learned step)
        x_t = xv[0:n, :].reshape(1, n)
        v = xv[n:S, :].reshape(1, m)
        z_t = z + (v - y) / rho_row
        x_new = alpha_t * x_t + (1.0 - alpha_t) * x
        z_new = jnp.minimum(jnp.maximum(z_t + y / rho_row, zl), zu)
        y_new = y + rho_row * (z_t - z_new)
        x_r[...] = x_new
        y_r[...] = y_new
        z_r[...] = z_new
        return 0

    jax.lax.fori_loop(0, K, step, 0, unroll=False)
    x_out[0] = x_r[:]
    y_out[0] = y_r[:]
    z_out[0] = z_r[:]


@functools.partial(jax.jit,
                   static_argnames=("hidden", "K", "sigma", "token_tile"))
def fused_rollout(params: Dict, data: QPBatch, *, hidden: int, K: int,
                  sigma: float = 6e-6, token_tile: int = 0
                  ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Run K learned iterations fully in-kernel; returns (x, y, z).

    Zero-initialised state (reference: main.py:328-334); problem data cast
    to bf16 for the resident matvecs, bounds/updates in f32.

    n and m are zero-padded to lane multiples (Mosaic per-instance blocks
    need 128-aligned trailing dims).  Zero rows/columns of Q/A0 cannot
    couple into real entries; pad bounds are [0, 0] so pad iterates stay
    inert, and outputs are sliced back.
    """
    B, n_true = data.p.shape
    m_true = data.num_constr
    n = _round_up(n_true, 128)
    m = _round_up(m_true, 128)
    S = n + m
    if token_tile:
        TS = token_tile
    elif S * 4 * hidden * 4 <= 48 * 1024 * 1024:
        # single tile: no inner loop / dynamic slices — an order of
        # magnitude faster Mosaic compile at flagship shapes (24 min -> ~1).
        # 48 MB gate scratch covers the QP_1500 workload (S=3072, h=800).
        TS = S
    else:
        TS = 512 if S % 512 == 0 else 256 if S % 256 == 0 else 128
    S_pad = _round_up(S, TS)

    def pad2(a, d1, fill=0.0):
        return jnp.pad(a, [(0, 0), (0, d1 - a.shape[1])],
                       constant_values=fill)

    def pad3(a, d1, d2):
        return jnp.pad(a, [(0, 0), (0, d1 - a.shape[1]),
                           (0, d2 - a.shape[2])])

    Qp = pad3(data.Q, n, n)
    A0p = pad3(data.A0, m, n)
    pp = pad2(data.p, n)
    zlp = pad2(data.zl, m)
    zup = pad2(data.zu, m)

    rho_sched = params["rho"].reshape(1, -1).astype(jnp.float32)
    alpha_sched = params["alpha"].reshape(1, -1).astype(jnp.float32)
    rhom = pad2(jnp.where(data.eq_mask, RHO_EQ_OVER_RHO_INEQ, 1.0
                          ).astype(jnp.float32), m, fill=1.0)

    h = hidden
    kernel = functools.partial(_rollout_kernel, n=n, m=m, hidden=h, K=K,
                               TS=TS, sigma=float(sigma))
    inst3 = lambda d1, d2, space=pltpu.VMEM: pl.BlockSpec(
        (1, d1, d2), lambda b: (b, 0, 0), memory_space=space)
    # per-instance vectors ride as (B, 1, d): Mosaic blocks need the last
    # two dims (1, d) to match/align, which (1, d) of a 2D (B, d) cannot.
    inst2 = lambda d: pl.BlockSpec((1, 1, d), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM)
    shared = lambda r, c: pl.BlockSpec((r, c), lambda b: (0, 0),
                                       memory_space=pltpu.VMEM)
    smem = lambda r, c: pl.BlockSpec((r, c), lambda b: (0, 0),
                                     memory_space=pltpu.SMEM)

    x, y, z = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            smem(1, K),                        # rho schedule (raw)
            smem(1, K),                        # alpha schedule (raw)
            inst3(n, n),                       # Q bf16
            inst3(m, n),                       # A0 bf16
            inst2(n),                          # p
            inst2(m), inst2(m),                # zl, zu
            inst2(m),                          # rho eq-multiplier
            shared(2, 4 * h),                  # W bf16
            shared(h, 4 * h),                  # U bf16
            shared(1, 4 * h),                  # b
            shared(h, 1),                      # W_h bf16
            shared(1, 1),                      # b_h
        ],
        out_specs=[inst2(n), inst2(m), inst2(m)],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, n), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, m), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, m), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((S_pad, h), jnp.bfloat16),   # H
            pltpu.VMEM((S_pad, h), jnp.float32),    # C
            pltpu.VMEM((S_pad, 1), jnp.float32),    # xv
            pltpu.VMEM((S_pad, 1), jnp.float32),    # g
            pltpu.VMEM((1, n), jnp.float32),        # x
            pltpu.VMEM((1, m), jnp.float32),        # y
            pltpu.VMEM((1, m), jnp.float32),        # z
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * K * (S_pad * (hidden + 2) * 4 * hidden
                               + 4 * (n * n + 2 * m * n)),
            bytes_accessed=2 * B * (n * n + m * n),
            transcendentals=5 * B * K * S_pad * hidden),
    )(rho_sched, alpha_sched,
      Qp.astype(jnp.bfloat16), A0p.astype(jnp.bfloat16),
      pp[:, None].astype(jnp.float32), zlp[:, None].astype(jnp.float32),
      zup[:, None].astype(jnp.float32), rhom[:, None],
      params["W"].astype(jnp.bfloat16), params["U"].astype(jnp.bfloat16),
      params["b"].reshape(1, -1).astype(jnp.float32),
      params["W_h"].astype(jnp.bfloat16),
      params["b_h"].reshape(1, -1).astype(jnp.float32))
    return x[:, 0, :n_true], y[:, 0, :m_true], z[:, 0, :m_true]


def fused_rollout_sharded(params: Dict, data: QPBatch, mesh, *,
                          hidden: int, K: int, sigma: float = 6e-6
                          ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Scenario-parallel megakernel over a ('data',) mesh: each device runs
    the kernel on its shard of the instance batch; no collectives (QPs are
    i.i.d.).  Batch must be divisible by the mesh size."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    def local(params, data):
        return fused_rollout(params, data, hidden=hidden, K=K, sigma=sigma)

    data_spec = jax.tree.map(lambda _: P("data"), data)
    return shard_map(
        local, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(), params), data_spec),
        out_specs=(P("data"), P("data"), P("data")),
        check_vma=False)(params, data)
