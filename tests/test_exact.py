"""Stage-II exact LU step: fixed-point and convergence properties."""

import numpy as np
import jax.numpy as jnp

from iadmm_tpu.problems import generators, oracle, io
from iadmm_tpu.types import init_state
from iadmm_tpu.solvers import exact, step as step_mod

SIGMA = 1e-6


def _labeled_batch():
    ds = generators.generate("QP", num_var=16, num_ineq=8, num_eq=8,
                             data_size=4, seed=7)
    oracle.label_dataset(ds, eps=1e-7)
    return ds, io.to_qp_batch(ds, dtype=jnp.float64)


def test_exact_admm_converges_to_oracle():
    """Iterating the exact step from zero must reach the oracle solution
    (the LU step IS the OSQP iteration with fixed rho)."""
    ds, data = _labeled_batch()
    B, n, m = data.batch, data.num_var, data.num_constr
    st = init_state(B, n, m, hidden_dim=1, dtype=jnp.float64)
    rho_vec = step_mod.rho_vector(jnp.float64(0.1), data.eq_mask)
    final = exact.feasibility_restoration(st, data, SIGMA, rho_vec,
                                          num_iters=3000)
    x_err = np.abs(np.asarray(final.x) - ds.x_opt).max()
    assert x_err < 1e-3, x_err
    pri = np.abs(np.einsum("bij,bj->bi", np.asarray(data.A0),
                           np.asarray(final.x)) - np.asarray(final.z)).max()
    assert pri < 1e-5


def test_optimal_point_is_fixed_point():
    """An optimal (x*, z*, y*) must be (nearly) invariant under the exact
    step — the ADMM fixed-point property (SURVEY.md §4)."""
    ds, data = _labeled_batch()
    B, n, m = data.batch, data.num_var, data.num_constr
    x_opt = jnp.asarray(ds.x_opt)
    y_opt = jnp.asarray(ds.y_opt)
    z_opt = jnp.clip(jnp.einsum("bij,bj->bi", data.A0, x_opt),
                     data.zl, data.zu)
    rho_vec = step_mod.rho_vector(jnp.float64(0.1), data.eq_mask)
    st = init_state(B, n, m, hidden_dim=1, dtype=jnp.float64)
    st = st.__class__(x=x_opt, y=y_opt, z=z_opt,
                      xv=jnp.concatenate([x_opt, y_opt], -1),
                      H=st.H, C=st.C)
    lu, piv = exact.lu_factorize(data, SIGMA, rho_vec)
    new = exact.exact_step(lu, piv, rho_vec, st, data, SIGMA)
    # movement should be at oracle-tolerance level, not O(1)
    assert np.abs(np.asarray(new.x) - np.asarray(st.x)).max() < 5e-4
    assert np.abs(np.asarray(new.z) - np.asarray(st.z)).max() < 5e-4


def test_build_kkt_blocks():
    _, data = _labeled_batch()
    rho_vec = step_mod.rho_vector(jnp.float64(0.2), data.eq_mask)
    K = exact.build_kkt(data, SIGMA, rho_vec)
    n, m = data.num_var, data.num_constr
    assert K.shape == (data.batch, n + m, n + m)
    assert np.allclose(np.asarray(K[:, :n, :n]),
                       np.asarray(data.Q) + SIGMA * np.eye(n))
    assert np.allclose(np.asarray(K[:, n:, :n]), np.asarray(data.A0))
    diag = np.asarray(K[:, n:, n:])[:, np.arange(m), np.arange(m)]
    assert np.allclose(diag, -1.0 / np.asarray(rho_vec))
