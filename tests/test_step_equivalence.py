"""The blockwise learned step must match a literal transliteration of the
reference algorithm (models/lstm.py:47-96) that materializes the full KKT
matrix Ã.  Run in float64 where the only differences are summation order."""

import numpy as np
import jax
import jax.numpy as jnp

from iadmm_tpu.problems import io
from iadmm_tpu.types import init_state
from iadmm_tpu.solvers import step as step_mod
from iadmm_tpu.solvers import cells, exact
from iadmm_tpu.solvers.step import RHO_EQ_OVER_RHO_INEQ

SIGMA = 6e-6


def naive_lstm_step(params, t, state, data, sigma):
    """Reference-shaped step: materialize Ã and b̃, dense matvecs, per-gate
    math (reference: models/lstm.py:60-96)."""
    B, n = data.p.shape
    m = data.num_constr
    rho = jax.nn.sigmoid(params["rho"][t])
    rho_vec = rho * jnp.where(data.eq_mask, RHO_EQ_OVER_RHO_INEQ, 1.0)
    alpha = 2.0 * jax.nn.sigmoid(params["alpha"][t])

    A_tild = exact.build_kkt(data, sigma, rho_vec)
    b_tild = jnp.concatenate([sigma * state.x - data.p,
                              state.z - state.y / rho_vec], axis=-1)
    res = jnp.einsum("bij,bj->bi", A_tild, state.xv) - b_tild
    g = jnp.einsum("bji,bj->bi", A_tild, res)  # Ãᵀ r
    inputs = jnp.stack([state.xv, g], axis=-1)

    h = params["W_h"].shape[0]
    ref = cells.to_reference_naming(params, "lstm")
    I_t = jax.nn.sigmoid(inputs @ ref["W_i"] + state.H @ ref["U_i"]
                         + ref["b_i"])
    F_t = jax.nn.sigmoid(inputs @ ref["W_f"] + state.H @ ref["U_f"]
                         + ref["b_f"])
    O_t = jax.nn.sigmoid(inputs @ ref["W_o"] + state.H @ ref["U_o"]
                         + ref["b_o"])
    U_t = jnp.tanh(inputs @ ref["W_u"] + state.H @ ref["U_u"] + ref["b_u"])
    C = I_t * U_t + F_t * state.C
    H = O_t * jnp.tanh(C)
    grad = (H @ ref["W_h"] + ref["b_h"])[..., 0]
    xv = state.xv - grad

    x_t, v = xv[:, :n], xv[:, n:]
    z_t = state.z + (v - state.y) / rho_vec
    x = alpha * x_t + (1 - alpha) * state.x
    z_temp = z_t
    z = jnp.maximum(jnp.minimum(z_temp + state.y / rho_vec, data.zu),
                    data.zl)
    y = state.y + rho_vec * (z_temp - z)
    return x, y, z, xv, H, C


def _setup(tiny_qp, hidden=16):
    data = io.to_qp_batch(tiny_qp, dtype=jnp.float64)
    B, n, m = data.batch, data.num_var, data.num_constr
    key = jax.random.PRNGKey(0)
    params = cells.lstm_init(key, 2, hidden, length=10, dtype=jnp.float64)
    st = init_state(B, n, m, hidden, dtype=jnp.float64)
    # random warm state so the test isn't trivially zero
    ks = jax.random.split(jax.random.PRNGKey(1), 6)
    st = st.__class__(
        x=0.1 * jax.random.normal(ks[0], st.x.shape, jnp.float64),
        y=0.1 * jax.random.normal(ks[1], st.y.shape, jnp.float64),
        z=0.1 * jax.random.normal(ks[2], st.z.shape, jnp.float64),
        xv=0.1 * jax.random.normal(ks[3], st.xv.shape, jnp.float64),
        H=0.1 * jax.random.normal(ks[4], st.H.shape, jnp.float64),
        C=0.1 * jax.random.normal(ks[5], st.C.shape, jnp.float64),
    )
    return data, params, st


def test_blockwise_matches_materialized(tiny_qp):
    data, params, st = _setup(tiny_qp)
    for t in range(3):
        new = step_mod.lstm_step(params, t, st, data, SIGMA)
        nx, ny, nz, nxv, nH, nC = naive_lstm_step(params, t, st, data, SIGMA)
        assert np.allclose(np.asarray(new.xv), np.asarray(nxv),
                           rtol=1e-9, atol=1e-11)
        assert np.allclose(np.asarray(new.x), np.asarray(nx),
                           rtol=1e-9, atol=1e-11)
        assert np.allclose(np.asarray(new.y), np.asarray(ny),
                           rtol=1e-9, atol=1e-11)
        assert np.allclose(np.asarray(new.z), np.asarray(nz),
                           rtol=1e-9, atol=1e-11)
        assert np.allclose(np.asarray(new.H), np.asarray(nH),
                           rtol=1e-9, atol=1e-11)
        st = new


def test_kkt_feature_blockwise(tiny_qp):
    data, params, st = _setup(tiny_qp)
    rho_vec = step_mod.rho_vector(jnp.float64(0.3), data.eq_mask)
    g = step_mod.kkt_feature(data, st.xv, st.x, st.y, st.z, SIGMA, rho_vec)
    A_tild = exact.build_kkt(data, SIGMA, rho_vec)
    b_tild = jnp.concatenate([SIGMA * st.x - data.p,
                              st.z - st.y / rho_vec], axis=-1)
    res = jnp.einsum("bij,bj->bi", A_tild, st.xv) - b_tild
    g_ref = jnp.einsum("bji,bj->bi", A_tild, res)
    assert np.allclose(np.asarray(g), np.asarray(g_ref),
                       rtol=1e-9, atol=1e-11)


def test_parameter_naming_roundtrip():
    key = jax.random.PRNGKey(2)
    params = cells.lstm_init(key, 2, 8, length=5)
    ref = cells.to_reference_naming(params, "lstm")
    assert set(ref) == {"W_i", "U_i", "b_i", "W_f", "U_f", "b_f",
                        "W_o", "U_o", "b_o", "W_u", "U_u", "b_u",
                        "W_h", "b_h", "rho", "alpha"}
    back = cells.from_reference_naming(ref, "lstm")
    for k in params:
        assert np.allclose(np.asarray(params[k]), np.asarray(back[k]))


def test_gru_and_variants_run(tiny_qp):
    data = io.to_qp_batch(tiny_qp, dtype=jnp.float64)
    B, n, m = data.batch, data.num_var, data.num_constr
    for name in ("gru", "safeguard_lstm", "multi_layer_lstm", "gd",
                 "indirect_lstm"):
        spec = step_mod.get_cell(name)
        params = spec.init(jax.random.PRNGKey(0), 2, 8, 10)
        st = init_state(B, n, m, 8, dtype=jnp.float64)
        new = spec.step(params, 0, st, data, SIGMA)
        for leaf in (new.x, new.y, new.z, new.xv):
            assert np.all(np.isfinite(np.asarray(leaf)))
        if name == "safeguard_lstm":
            assert "alpha" not in params


def test_indirect_system_is_kkt_schur_complement(tiny_qp):
    """Pins the indirect (normal-equation) reconstruction to the direct KKT
    system (VERDICT round-1 weak item): eliminating the dual block ν from
    Ã·[x̃;ν] = b̃ must give exactly the indirect step's M x̃ = rhs, and the
    direct z̃-update z + (ν−y)/ρ must collapse to the indirect step's
    z̃ = A0·x̃.  Solving both systems exactly therefore yields identical
    (x̃, z̃) — the reconstruction is the same algorithm in reduced form."""
    data = io.to_qp_batch(tiny_qp, dtype=jnp.float64)
    _, params, st = _setup(io.to_qp_batch(tiny_qp, dtype=jnp.float64))
    rho_vec = step_mod.rho_vector(jnp.float64(0.3), data.eq_mask)
    n = data.num_var

    # direct KKT solve
    A_tild = exact.build_kkt(data, SIGMA, rho_vec)
    b_tild = jnp.concatenate([SIGMA * st.x - data.p,
                              st.z - st.y / rho_vec], axis=-1)
    xv = jnp.linalg.solve(A_tild, b_tild[..., None])[..., 0]
    x_dir, nu = xv[:, :n], xv[:, n:]
    z_dir = st.z + (nu - st.y) / rho_vec

    # indirect (reduced) solve via the step's own system builder
    matvec_M, rhs = step_mod.indirect_system(data, st.x, st.y, st.z,
                                             SIGMA, rho_vec)
    # materialize M column-by-column through the matvec closure
    eye = jnp.eye(n, dtype=jnp.float64)
    M = jnp.stack([matvec_M(jnp.broadcast_to(eye[i], (data.batch, n)))
                   for i in range(n)], axis=-1)
    x_ind = jnp.linalg.solve(M, rhs[..., None])[..., 0]
    z_ind = jnp.einsum("bij,bj->bi", data.A0, x_ind)

    assert np.allclose(np.asarray(x_ind), np.asarray(x_dir),
                       rtol=1e-8, atol=1e-10)
    assert np.allclose(np.asarray(z_ind), np.asarray(z_dir),
                       rtol=1e-8, atol=1e-10)
