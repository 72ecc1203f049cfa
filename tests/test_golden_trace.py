"""Golden-trace regression guard: fixed-seed f64 rollout residual curves
must stay bit-stable (up to tight tolerance) across refactors."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from iadmm_tpu.problems import generators, io
from iadmm_tpu.scaling import scale_batch
from iadmm_tpu.solvers import rollouts as R
from iadmm_tpu.solvers.cells import lstm_init
from iadmm_tpu.solvers.step import lstm_step
from iadmm_tpu.types import init_state

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "qp_rollout_trace.npz")


def _compute_trace():
    ds = generators.generate("QP", num_var=12, num_ineq=6, num_eq=6,
                             data_size=4, seed=21)
    data = io.to_qp_batch(ds, dtype=jnp.float64)
    scaled, sc = scale_batch(data, iters=10)
    params = lstm_init(jax.random.PRNGKey(42), 2, 8, 6, dtype=jnp.float64)
    st = init_state(4, 12, 12, 8, dtype=jnp.float64)
    _, tr = R.eval_rollout(lstm_step, params, st, scaled, data, sc,
                           1e-6, 6, metrics_mode="highest")
    return dict(primal=np.asarray(tr.primal_res),
                dual=np.asarray(tr.dual_res),
                obj=np.asarray(tr.obj), ls=np.asarray(tr.ls_res))


def test_rollout_matches_golden():
    got = _compute_trace()
    if not os.path.exists(GOLDEN):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.savez(GOLDEN, **got)
    ref = dict(np.load(GOLDEN))
    for k in ("primal", "dual", "obj", "ls"):
        np.testing.assert_allclose(got[k], ref[k], rtol=1e-9, atol=1e-12,
                                   err_msg=k)
