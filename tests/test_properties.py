"""Property tests (SURVEY.md §4 test-strategy design):
projection idempotence, ADMM fixed-point invariance, scaling bounds,
rho_vec semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from iadmm_tpu.problems import generators, io, oracle
from iadmm_tpu.scaling import ruiz_scale
from iadmm_tpu.solvers import exact as exact_mod
from iadmm_tpu.solvers.step import rho_vector, admm_update, RHO_EQ_OVER_RHO_INEQ
from iadmm_tpu.types import IterState


def test_box_projection_idempotent(tiny_qp):
    data = io.to_qp_batch(tiny_qp, dtype=jnp.float64)
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((8, data.num_constr)) * 10)
    proj = jnp.clip(v, data.zl, data.zu)
    proj2 = jnp.clip(proj, data.zl, data.zu)
    np.testing.assert_array_equal(np.asarray(proj), np.asarray(proj2))
    assert bool((proj >= data.zl).all() and (proj <= data.zu).all())


def test_rho_vec_row_semantics(tiny_qp):
    data = io.to_qp_batch(tiny_qp, dtype=jnp.float64)
    rho = rho_vector(jnp.float64(0.25), data.eq_mask)
    eq = np.asarray(data.eq_mask)
    r = np.asarray(rho)
    assert np.allclose(r[eq], 0.25 * RHO_EQ_OVER_RHO_INEQ)
    assert np.allclose(r[~eq], 0.25)


def test_optimal_point_is_admm_fixed_point():
    """An oracle-optimal (x*, z*=A0x*, y*) is (near-)invariant under the
    exact Stage-II step (SURVEY.md §4 property list)."""
    ds = generators.generate("QP", num_var=12, num_ineq=6, num_eq=6,
                             data_size=2, seed=9)
    oracle.label_dataset(ds, eps=1e-10, max_iter=100000)
    data = io.to_qp_batch(ds, dtype=jnp.float64)
    x = jnp.asarray(ds.x_opt)
    y = jnp.asarray(ds.y_opt)
    z = jnp.einsum("bij,bj->bi", data.A0, x)
    rho = rho_vector(jnp.float64(0.3), data.eq_mask)
    st = IterState(x=x, y=y, z=z,
                   xv=jnp.concatenate([x, y], -1),
                   H=jnp.zeros((2, 24, 2)), C=jnp.zeros((2, 24, 2)))
    lu, piv = exact_mod.lu_factorize(data, 1e-8, rho)
    st2 = exact_mod.exact_step(lu, piv, rho, st, data, 1e-8)
    assert float(jnp.abs(st2.x - x).max()) < 1e-4
    assert float(jnp.abs(st2.z - z).max()) < 1e-4
    assert float(jnp.abs(st2.y - y).max()) < 1e-3


def test_scaling_factors_bounded(tiny_qp):
    data = io.to_qp_batch(tiny_qp, dtype=jnp.float64)
    _, _, _, _, _, st = ruiz_scale(data.Q, data.p, data.A0, data.zl,
                                   data.zu, iters=10)
    for v in (st.d, st.e):
        a = np.asarray(v)
        assert (a > 0).all()
        # products of per-sweep factors, each in [1e-2, 1e2] after the
        # sqrt of the [1e-4, 1e4] clamp
        assert np.isfinite(a).all()
    # scaled KKT columns approach unit inf-norm
    Qs, ps, A0s, _, _, _ = ruiz_scale(data.Q, data.p, data.A0, data.zl,
                                      data.zu, iters=10)
    first = np.maximum(np.abs(np.asarray(Qs)).max(-2),
                       np.abs(np.asarray(A0s)).max(-2))
    assert first.max() < 10.0 and first.min() > 1e-2


def test_admm_update_relaxation_semantics(tiny_qp):
    """alpha=1 + relax_z=False reduces to the plain projected update."""
    data = io.to_qp_batch(tiny_qp, dtype=jnp.float64)
    rng = np.random.default_rng(3)
    B, n, m = 8, data.num_var, data.num_constr
    xv = jnp.asarray(rng.standard_normal((B, n + m)))
    x = jnp.asarray(rng.standard_normal((B, n)))
    y = jnp.asarray(rng.standard_normal((B, m)))
    z = jnp.asarray(rng.standard_normal((B, m)))
    rho = rho_vector(jnp.float64(0.2), data.eq_mask)
    x1, y1, z1 = admm_update(data, xv, x, y, z, rho, 1.0, relax_z=False)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(xv[:, :n]))
    z_t = z + (xv[:, n:] - y) / rho
    z_expect = jnp.clip(z_t + y / rho, data.zl, data.zu)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z_expect))
