"""Learned solver cells: parameter initialisation and core recurrences.

Functional re-design of the reference's ``nn.Module`` cells.  Parameters are
plain dicts of arrays (optax/orbax-friendly pytrees).  The four LSTM gate
input/hidden projections are stored **fused** as single ``(in, 4h)`` /
``(h, 4h)`` matrices in gate order ``[i, f, o, u]`` so each step issues one
MXU matmul per operand instead of four (the reference does 8 separate
matmuls per step, reference: models/lstm.py:74-77).  Entries are iid
N(0, 0.01²) with zero biases, the same distribution as the reference's
per-gate init (reference: models/lstm.py:21-41), so fusing changes nothing
statistically.

Cell inventory (capability list from the reference's live + ghost models,
SURVEY.md §2.1/§2.3):
  * ``lstm``            — live model (reference: models/lstm.py:6-96)
  * ``gru``             — ghost models/gru.py (gates W_z/U_z, W_r/U_r, W_u/U_u)
  * ``multi_layer_lstm``— ghost models/muti_layer_lstm.py (inner_T inner steps,
                           no learned rho/alpha)
  * ``safeguard_lstm``  — ghost models/safeguard_lstm_no_alpha.py (learned rho
                           only, fixed alpha)
  * ``gd``              — ghost models/gradient_descent.py (plain gradient
                           step on the KKT residual, no parameters but a step
                           size)
  * ``indirect_lstm``   — ghost models/indirect_lstm.py (LSTM on the reduced /
                           normal-equation system over the n variable tokens)
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

Params = Dict[str, jax.Array]

# Module-level matmul precision for cell/gate matmuls.  HIGHEST reproduces
# f32 torch numerics; 'default' lets the MXU use bf16 passes (fast path).
GATE_PRECISION = jax.lax.Precision.HIGHEST


def _normal(key, shape, std=0.01, dtype=jnp.float32):
    return std * jax.random.normal(key, shape, dtype)


# ---------------------------------------------------------------------------
# LSTM (live model parity)
# ---------------------------------------------------------------------------

def lstm_init(key, input_dim: int, hidden_dim: int, length: int,
              dtype=jnp.float32) -> Params:
    """Gate weights N(0,0.01²), zero biases, learned per-iteration rho/alpha
    raw scalars (reference: models/lstm.py:21-41)."""
    kw, ku, kh, kr, ka = jax.random.split(key, 5)
    return {
        "W": _normal(kw, (input_dim, 4 * hidden_dim), dtype=dtype),
        "U": _normal(ku, (hidden_dim, 4 * hidden_dim), dtype=dtype),
        "b": jnp.zeros((4 * hidden_dim,), dtype),
        "W_h": _normal(kh, (hidden_dim, 1), dtype=dtype),
        "b_h": jnp.zeros((1,), dtype),
        "rho": _normal(kr, (length,), dtype=dtype),
        "alpha": _normal(ka, (length,), dtype=dtype),
    }


def lstm_apply(params: Params, inputs: jax.Array, H: jax.Array,
               C: jax.Array, gate_dtype: str = None):
    """One shared-weight LSTM cell over the (n+m) token axis
    (reference: models/lstm.py:74-82).

    inputs: (B, nm, in_dim); H, C: (B, nm, h). Returns (delta (B, nm), H, C).
    ``gate_dtype='bfloat16'`` runs the gate matmuls in bf16 with f32
    accumulation (matches the Pallas fast path; used for its backward).
    """
    h = H.shape[-1]
    if gate_dtype == "bfloat16":
        bf = jnp.bfloat16
        prec, pet = jax.lax.Precision.DEFAULT, jnp.float32

        def cast(a):
            return a.astype(bf)
    else:
        prec, pet = GATE_PRECISION, None

        def cast(a):
            return a
    gates = (jnp.einsum("bsi,ik->bsk", cast(inputs), cast(params["W"]),
                        precision=prec, preferred_element_type=pet)
             + jnp.einsum("bsh,hk->bsk", cast(H), cast(params["U"]),
                          precision=prec, preferred_element_type=pet)
             + params["b"])
    i_t = jax.nn.sigmoid(gates[..., 0 * h:1 * h])
    f_t = jax.nn.sigmoid(gates[..., 1 * h:2 * h])
    o_t = jax.nn.sigmoid(gates[..., 2 * h:3 * h])
    u_t = jnp.tanh(gates[..., 3 * h:4 * h])
    C_new = i_t * u_t + f_t * C.astype(gates.dtype)
    H_new = o_t * jnp.tanh(C_new)
    delta = (jnp.einsum("bsh,ho->bso", cast(H_new), cast(params["W_h"]),
                        precision=prec, preferred_element_type=pet)
             + params["b_h"])[..., 0]
    return delta, H_new.astype(H.dtype), C_new.astype(C.dtype)


# ---------------------------------------------------------------------------
# GRU (ghost models/gru.py)
# ---------------------------------------------------------------------------

def gru_init(key, input_dim: int, hidden_dim: int, length: int,
             dtype=jnp.float32) -> Params:
    """Gates fused in order [z, r, u] (update, reset, candidate)."""
    kw, ku, kh, kr, ka = jax.random.split(key, 5)
    return {
        "W": _normal(kw, (input_dim, 3 * hidden_dim), dtype=dtype),
        "U": _normal(ku, (hidden_dim, 3 * hidden_dim), dtype=dtype),
        "b": jnp.zeros((3 * hidden_dim,), dtype),
        "W_h": _normal(kh, (hidden_dim, 1), dtype=dtype),
        "b_h": jnp.zeros((1,), dtype),
        "rho": _normal(kr, (length,), dtype=dtype),
        "alpha": _normal(ka, (length,), dtype=dtype),
    }


def gru_apply(params: Params, inputs: jax.Array, H: jax.Array, C: jax.Array):
    """Standard GRU recurrence over tokens; C is carried untouched so the
    state layout matches the LSTM harness (the ghost model also accepted and
    returned C_t)."""
    h = H.shape[-1]
    xw = jnp.einsum("bsi,ik->bsk", inputs, params["W"],
                    precision=GATE_PRECISION)
    hu = jnp.einsum("bsh,hk->bsk", H, params["U"][:, :2 * h],
                    precision=GATE_PRECISION)
    b = params["b"]
    z_t = jax.nn.sigmoid(xw[..., :h] + hu[..., :h] + b[:h])
    r_t = jax.nn.sigmoid(xw[..., h:2 * h] + hu[..., h:2 * h] + b[h:2 * h])
    u_in = xw[..., 2 * h:] + b[2 * h:]
    u_hid = jnp.einsum("bsh,hk->bsk", r_t * H, params["U"][:, 2 * h:],
                       precision=GATE_PRECISION)
    u_t = jnp.tanh(u_in + u_hid)
    H = (1.0 - z_t) * H + z_t * u_t
    delta = (jnp.einsum("bsh,ho->bso", H, params["W_h"],
                        precision=GATE_PRECISION) + params["b_h"])[..., 0]
    return delta, H, C


# ---------------------------------------------------------------------------
# Safeguard LSTM (no alpha) — learned rho only (ghost)
# ---------------------------------------------------------------------------

def safeguard_lstm_init(key, input_dim: int, hidden_dim: int, length: int,
                        dtype=jnp.float32) -> Params:
    p = lstm_init(key, input_dim, hidden_dim, length, dtype)
    del p["alpha"]  # fixed relaxation, ghost ablation had no alpha parameter
    return p


# ---------------------------------------------------------------------------
# Multi-layer LSTM — inner_T LSTM refinement steps per ADMM iteration (ghost)
# ---------------------------------------------------------------------------

def multi_layer_lstm_init(key, input_dim: int, hidden_dim: int,
                          inner_T: int, dtype=jnp.float32) -> Params:
    """Same weight set as the LSTM, no learned schedules; ``inner_T`` inner
    refinements reuse the shared weights (ghost models/muti_layer_lstm.py;
    explains the orphan ``inner_T: 50`` key, reference: configs/QP.yaml:28)."""
    kw, ku, kh = jax.random.split(key, 3)
    return {
        "W": _normal(kw, (input_dim, 4 * hidden_dim), dtype=dtype),
        "U": _normal(ku, (hidden_dim, 4 * hidden_dim), dtype=dtype),
        "b": jnp.zeros((4 * hidden_dim,), dtype),
        "W_h": _normal(kh, (hidden_dim, 1), dtype=dtype),
        "b_h": jnp.zeros((1,), dtype),
    }


# ---------------------------------------------------------------------------
# Reference <-> fused parameter layout converters
# ---------------------------------------------------------------------------

_LSTM_GATES = ("i", "f", "o", "u")
_GRU_GATES = ("z", "r", "u")


def to_reference_naming(params: Params, kind: str = "lstm") -> Params:
    """Split fused [W|U|b] into the reference's per-gate tensors
    (W_i/U_i/b_i ... reference: models/lstm.py:21-38) for checkpoint export /
    cross-checking against reference state dicts."""
    gates = _LSTM_GATES if kind in ("lstm", "safeguard_lstm",
                                    "multi_layer_lstm") else _GRU_GATES
    h = params["W_h"].shape[0]
    out = {}
    for gi, g in enumerate(gates):
        out[f"W_{g}"] = params["W"][:, gi * h:(gi + 1) * h]
        out[f"U_{g}"] = params["U"][:, gi * h:(gi + 1) * h]
        out[f"b_{g}"] = params["b"][gi * h:(gi + 1) * h]
    out["W_h"] = params["W_h"]
    out["b_h"] = params["b_h"]
    for k in ("rho", "alpha"):
        if k in params:
            out[k] = params[k][:, None]  # reference stores (length, 1)
    return out


def from_reference_naming(ref: Params, kind: str = "lstm") -> Params:
    gates = _LSTM_GATES if kind in ("lstm", "safeguard_lstm",
                                    "multi_layer_lstm") else _GRU_GATES
    out = {
        "W": jnp.concatenate([jnp.asarray(ref[f"W_{g}"]) for g in gates], -1),
        "U": jnp.concatenate([jnp.asarray(ref[f"U_{g}"]) for g in gates], -1),
        "b": jnp.concatenate([jnp.asarray(ref[f"b_{g}"]) for g in gates], -1),
        "W_h": jnp.asarray(ref["W_h"]),
        "b_h": jnp.asarray(ref["b_h"]),
    }
    for k in ("rho", "alpha"):
        if k in ref:
            out[k] = jnp.asarray(ref[k]).reshape(-1)
    return out
