"""Matrix-free CG Stage II vs the dense-LU Stage II."""

import jax
import jax.numpy as jnp
import numpy as np

from iadmm_tpu.problems import generators, io
from iadmm_tpu.solvers import cg as cg_mod
from iadmm_tpu.solvers import exact as exact_mod
from iadmm_tpu.solvers.step import rho_vector
from iadmm_tpu.types import init_state

SIGMA = 1e-6


def _setup(seed=0):
    ds = generators.generate("QP", num_var=14, num_ineq=7, num_eq=7,
                             data_size=4, seed=seed)
    data = io.to_qp_batch(ds, dtype=jnp.float64)
    rho = rho_vector(jnp.float64(0.2), data.eq_mask)
    st = init_state(4, data.num_var, data.num_constr, 4, dtype=jnp.float64)
    return data, rho, st


def test_cg_solves_condensed_system():
    data, rho, st = _setup()
    b = jax.random.normal(jax.random.PRNGKey(0),
                          (4, data.num_var), jnp.float64)
    diag = cg_mod.jacobi_diag(data, SIGMA, rho)
    x, res = cg_mod.batched_cg(
        lambda v: cg_mod.condensed_matvec(data, v, SIGMA, rho),
        b, jnp.zeros_like(b), diag, maxiter=400, tol=1e-12)
    Mx = cg_mod.condensed_matvec(data, x, SIGMA, rho)
    np.testing.assert_allclose(np.asarray(Mx), np.asarray(b), rtol=1e-7,
                               atol=1e-8)


def test_cg_step_matches_lu_step():
    data, rho, st = _setup(seed=3)
    lu, piv = exact_mod.lu_factorize(data, SIGMA, rho)
    st_lu = st
    st_cg = st
    for _ in range(3):
        st_lu = exact_mod.exact_step(lu, piv, rho, st_lu, data, SIGMA)
        st_cg = cg_mod.exact_step_cg(rho, st_cg, data, SIGMA,
                                     maxiter=500, tol=1e-13)
        for name in ("x", "y", "z"):
            np.testing.assert_allclose(np.asarray(getattr(st_cg, name)),
                                       np.asarray(getattr(st_lu, name)),
                                       rtol=1e-6, atol=1e-8, err_msg=name)


def test_cg_restoration_converges():
    data, rho, st = _setup(seed=5)
    final = cg_mod.feasibility_restoration_cg(st, data, SIGMA, rho,
                                              num_iters=40, cg_iters=300)
    from iadmm_tpu.evaluation import metrics
    pr, dr = metrics.primal_dual_residual(final.x, final.y, final.z,
                                          data.Q, data.p, data.A0)
    assert float(np.asarray(pr).max()) < 1e-2
