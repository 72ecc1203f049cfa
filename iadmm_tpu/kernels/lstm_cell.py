"""Fused Pallas TPU kernel for the shared-weight LSTM token cell.

The learned solver applies one LSTM cell across the ``n+m`` "token" axis of
the stacked KKT iterate (reference: models/lstm.py:74-82).  The XLA version
(:func:`iadmm_tpu.solvers.cells.lstm_apply`) materializes the ``(B, S, 4h)``
gate pre-activations in HBM between the matmul and the elementwise phase;
at the flagship QP_1000_500_500 / h=800 workload that is a ~26 MB/instance
round trip per ADMM iteration.  This kernel computes gates tile-by-tile:

  per (batch b, token tile s):
    gates = x_tile @ W + H_tile @ U + b          (MXU, f32 accumulate)
    i,f,o = sigmoid(.), u = tanh(.)              (VPU)
    C' = i*u + f*C_tile;  H' = o*tanh(C')        (VPU)
    delta = H' @ W_h + b_h                        (MXU)

so the 4h-wide pre-activations never leave VMEM.  The gate weights W/U are
grid-invariant blocks and are fetched into VMEM once.  ``gate_dtype=bfloat16``
halves weight bandwidth/VMEM and triples MXU throughput; accumulation is
always float32.

Training support: :func:`fused_lstm_cell` carries a ``jax.custom_vjp`` whose
backward recomputes the cell with the plain-jnp implementation (rematerial-
isation — cheaper than saving the 4h gate tensor), so the Pallas forward is
usable inside the TBPTT loss with exact gradients.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..solvers import cells

# Tokens per grid step.  VMEM use ≈ U (resident) + double-buffered H/C
# tiles + the 4h-wide f32 gate scratch; the compiler VMEM limit is raised
# accordingly in _pallas_forward.
TOKEN_TILE = 512


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _cell_kernel(x_ref, h_ref, c_ref, w_ref, u_ref, b_ref,
                 wh_ref, bh_ref, delta_ref, h_out_ref, c_out_ref, *,
                 hidden: int, gate_dtype):
    x = x_ref[0]          # (TS, in_dim)
    H = h_ref[0]          # (TS, h)
    C = c_ref[0]          # (TS, h)
    # bf16 gates: one MXU pass, f32 accumulate.  f32 gates: HIGHEST precision
    # (3-pass) for parity with the jnp/torch numerics.
    prec = (jax.lax.Precision.HIGHEST if gate_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)

    def mm(a, w):
        return jax.lax.dot_general(a.astype(gate_dtype), w,
                                   (((1,), (0,)), ((), ())), precision=prec,
                                   preferred_element_type=jnp.float32)

    gates = mm(x, w_ref[:]) + mm(H, u_ref[:]) + b_ref[:]
    # (TS, 4h) f32, never leaves VMEM.
    # Manual exp-based sigmoid/tanh: numerically equivalent in f32 (inf
    # saturates correctly) but avoids a Mosaic pathologic-compile-time path
    # for jax.nn.sigmoid/jnp.tanh at these tile shapes (minutes -> seconds).
    h = hidden

    def sig(v):
        return 1.0 / (1.0 + jnp.exp(-v))

    def tanh(v):
        return 2.0 / (1.0 + jnp.exp(-2.0 * v)) - 1.0

    i_t = sig(gates[:, 0 * h:1 * h])
    f_t = sig(gates[:, 1 * h:2 * h])
    o_t = sig(gates[:, 2 * h:3 * h])
    u_t = tanh(gates[:, 3 * h:4 * h])
    C_new = i_t * u_t + f_t * C
    H_new = o_t * tanh(C_new)
    delta = mm(H_new, wh_ref[:]) + bh_ref[:]
    delta_ref[0] = delta        # (TS, 1)
    # H/C carries mirror the input state dtype (bf16 carry halves the
    # dominant HBM traffic of the rollout; compute stays f32 above).
    h_out_ref[0] = H_new.astype(h_out_ref.dtype)
    c_out_ref[0] = C_new.astype(c_out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("gate_dtype_name",
                                             "token_tile"))
def _pallas_forward(W, U, b, W_h, b_h, inputs, H, C,
                    gate_dtype_name: str = "float32",
                    token_tile: int = 0):
    gate_dtype = jnp.dtype(gate_dtype_name)
    B, S, in_dim = inputs.shape
    hidden = H.shape[-1]
    TS = token_tile or TOKEN_TILE
    S_pad = _round_up(S, TS)
    if S_pad != S:
        pad = [(0, 0), (0, S_pad - S), (0, 0)]
        inputs = jnp.pad(inputs, pad)
        H = jnp.pad(H, pad)
        C = jnp.pad(C, pad)

    W = W.astype(gate_dtype)
    W_h = W_h.astype(gate_dtype)
    b2 = b.reshape(1, -1).astype(jnp.float32)
    bh2 = b_h.reshape(1, -1).astype(jnp.float32)
    U = U.astype(gate_dtype)

    grid = (B, S_pad // TS)
    tile3 = lambda d: pl.BlockSpec((1, TS, d), lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM)
    full2 = lambda r, c: pl.BlockSpec((r, c), lambda i, j: (0, 0),
                                      memory_space=pltpu.VMEM)

    flops = 2 * B * S_pad * (in_dim + hidden + 1) * 4 * hidden
    kernel = functools.partial(_cell_kernel, hidden=hidden,
                               gate_dtype=gate_dtype)
    delta, H_new, C_new = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            tile3(in_dim),                       # inputs
            tile3(hidden),                       # H
            tile3(hidden),                       # C
            full2(in_dim, 4 * hidden),           # W (grid-invariant)
            full2(hidden, 4 * hidden),           # U (grid-invariant)
            full2(1, 4 * hidden),                # b
            full2(hidden, 1),                    # W_h
            full2(1, 1),                         # b_h
        ],
        out_specs=[tile3(1), tile3(hidden), tile3(hidden)],
        out_shape=[
            jax.ShapeDtypeStruct((B, S_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, S_pad, hidden), H.dtype),
            jax.ShapeDtypeStruct((B, S_pad, hidden), C.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=4 * B * S_pad * (3 * hidden + in_dim),
            transcendentals=4 * B * S_pad * hidden),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(inputs, H, C, W, U, b2, W_h, bh2)

    delta = delta[:, :S, 0]
    return delta, H_new[:, :S], C_new[:, :S]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_lstm_cell(params: Dict, inputs, H, C,
                    gate_dtype_name: str = "float32"):
    """Pallas-fused LSTM token cell; drop-in for
    :func:`iadmm_tpu.solvers.cells.lstm_apply` (same (delta, H', C') contract).
    """
    return _pallas_forward(params["W"], params["U"], params["b"],
                           params["W_h"], params["b_h"], inputs, H, C,
                           gate_dtype_name=gate_dtype_name)


def _fwd(params, inputs, H, C, gate_dtype_name):
    out = _pallas_forward(params["W"], params["U"], params["b"],
                          params["W_h"], params["b_h"], inputs, H, C,
                          gate_dtype_name=gate_dtype_name)
    return out, (params, inputs, H, C)


def _bwd(gate_dtype_name, residuals, cotangents):
    params, inputs, H, C = residuals
    cell_keys = ("W", "U", "b", "W_h", "b_h")
    sub = {k: params[k] for k in cell_keys}
    # Recompute with the SAME gate dtype as the forward kernel: bf16
    # forward gets a bf16-matmul backward (fast profile end to end).
    _, vjp = jax.vjp(
        lambda p, i, h, c: cells.lstm_apply(p, i, h, c,
                                            gate_dtype=gate_dtype_name),
        sub, inputs, H, C)
    d_sub, d_in, d_H, d_C = vjp(cotangents)
    d_params = {k: (d_sub[k] if k in d_sub else jnp.zeros_like(v))
                for k, v in params.items()}
    return d_params, d_in, d_H, d_C


fused_lstm_cell.defvjp(_fwd, _bwd)


def make_pallas_lstm_apply(gate_dtype: str = "float32"):
    """cell_apply-compatible callable backed by the fused kernel."""
    def apply(params, inputs, H, C):
        return fused_lstm_cell(params, inputs, H, C, gate_dtype)
    return apply
