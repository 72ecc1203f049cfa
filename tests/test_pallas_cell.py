"""Fused Pallas LSTM-cell kernel vs the plain-jnp cell (interpret mode on
CPU; the same kernel compiles with Mosaic on real TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from iadmm_tpu.solvers import cells
from iadmm_tpu.kernels.lstm_cell import fused_lstm_cell
from iadmm_tpu.solvers.step import make_lstm_step, lstm_step
from iadmm_tpu.problems.io import to_qp_batch
from iadmm_tpu.types import init_state


@pytest.fixture(scope="module")
def cell_setup():
    key = jax.random.PRNGKey(0)
    B, S, h = 2, 40, 16  # S deliberately not a multiple of the token tile
    params = cells.lstm_init(key, input_dim=2, hidden_dim=h, length=4)
    k1, k2, k3 = jax.random.split(key, 3)
    inputs = jax.random.normal(k1, (B, S, 2), jnp.float32)
    H = jax.random.normal(k2, (B, S, h), jnp.float32)
    C = jax.random.normal(k3, (B, S, h), jnp.float32)
    return params, inputs, H, C


def test_forward_matches_jnp(cell_setup):
    params, inputs, H, C = cell_setup
    d_ref, H_ref, C_ref = cells.lstm_apply(params, inputs, H, C)
    with pltpu.force_tpu_interpret_mode():
        d, H2, C2 = fused_lstm_cell(params, inputs, H, C, "float32")
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(H2), np.asarray(H_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(C2), np.asarray(C_ref),
                               rtol=1e-5, atol=1e-6)


def test_gradients_match_jnp(cell_setup):
    params, inputs, H, C = cell_setup

    def loss_pallas(p, i, h, c):
        d, H2, C2 = fused_lstm_cell(p, i, h, c, "float32")
        return (d ** 2).sum() + (H2 * C2).sum()

    def loss_ref(p, i, h, c):
        d, H2, C2 = cells.lstm_apply(p, i, h, c)
        return (d ** 2).sum() + (H2 * C2).sum()

    with pltpu.force_tpu_interpret_mode():
        g_p = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(
            params, inputs, H, C)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(params, inputs, H, C)
    flat_p, _ = jax.tree_util.tree_flatten(g_p)
    flat_r, _ = jax.tree_util.tree_flatten(g_r)
    for a, b in zip(flat_p, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_pallas_step_matches_jnp_step(tiny_qp):
    data = to_qp_batch(tiny_qp, idx=np.arange(4))
    params = cells.lstm_init(jax.random.PRNGKey(1), 2, 16, 4)
    st = init_state(4, data.num_var, data.num_constr, 16)
    sigma = jnp.float32(6e-6)
    ref = lstm_step(params, 0, st, data, sigma)
    step = make_lstm_step(use_pallas=True, gate_dtype="float32")
    with pltpu.force_tpu_interpret_mode():
        out = step(params, 0, st, data, sigma)
    for name in ("x", "y", "z", "xv", "H", "C"):
        np.testing.assert_allclose(np.asarray(getattr(out, name)),
                                   np.asarray(getattr(ref, name)),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=name)

