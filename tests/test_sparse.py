"""Sparse (BCOO) problem-data path vs the dense step."""

import jax
import jax.numpy as jnp
import numpy as np

from iadmm_tpu.kernels import sparse as sp
from iadmm_tpu.problems.generators import generate
from iadmm_tpu.problems.io import to_qp_batch
from iadmm_tpu.solvers.cells import lstm_init
from iadmm_tpu.solvers.step import lstm_step
from iadmm_tpu.types import init_state


def test_sparse_step_matches_dense():
    ds = generate("Random_QP", num_var=16, num_ineq=24, data_size=4, seed=5)
    data = to_qp_batch(ds, with_metric_views=False)
    sdata = sp.from_dense(data)
    params = lstm_init(jax.random.PRNGKey(0), 2, 8, 3)
    st = init_state(4, data.num_var, data.num_constr, 8)
    sigma = jnp.float32(6e-6)
    for t in range(3):
        ref = lstm_step(params, t, st, data, sigma)
        out = sp.sparse_lstm_step(params, t, st, sdata, sigma)
        for name in ("x", "y", "z", "xv", "H", "C"):
            np.testing.assert_allclose(np.asarray(getattr(out, name)),
                                       np.asarray(getattr(ref, name)),
                                       rtol=1e-5, atol=1e-6, err_msg=name)
        st = ref


def test_bcoo_matvecs():
    rng = np.random.default_rng(0)
    M = rng.standard_normal((3, 6, 5)) * (rng.random((3, 6, 5)) < 0.4)
    v = rng.standard_normal((3, 5))
    w = rng.standard_normal((3, 6))
    from jax.experimental import sparse as jsparse
    Mb = jsparse.BCOO.fromdense(jnp.asarray(M), n_batch=1)
    np.testing.assert_allclose(np.asarray(sp._bmv(Mb, jnp.asarray(v))),
                               np.einsum("bij,bj->bi", M, v), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sp._bmv_t(Mb, jnp.asarray(w))),
                               np.einsum("bij,bi->bj", M, w), atol=1e-6)
