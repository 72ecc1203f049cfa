"""High-level solve API: full pipeline in one jitted call."""

import jax
import numpy as np

import iadmm_tpu as it
from iadmm_tpu.problems import generators, io
from iadmm_tpu.solvers.cells import lstm_init


def test_make_solver_end_to_end():
    ds = generators.generate("QP", num_var=16, num_ineq=8, num_eq=8,
                             data_size=6, seed=7)
    data = io.to_qp_batch(ds, dtype=np.float32 if False else None)
    params = lstm_init(jax.random.PRNGKey(0), 2, 16, 8)
    solve = it.make_solver(params, hidden_dim=16, num_iters=8,
                           feas_rest_num=20)
    res = solve(data)
    assert res.x.shape == (6, 16)
    # Stage II with 20 exact steps must reach small primal residual even
    # with random (untrained) learned iterations before it.
    assert float(np.asarray(res.primal_res).max()) < 0.05
    assert np.isfinite(np.asarray(res.obj)).all()


def test_solver_without_scaling_or_stage2():
    ds = generators.generate("Random_QP", num_var=12, num_ineq=18,
                             data_size=4, seed=2)
    data = io.to_qp_batch(ds, with_metric_views=False)
    params = lstm_init(jax.random.PRNGKey(1), 2, 8, 4)
    res = it.solve_qp_batch(data, params, hidden_dim=8, num_iters=4,
                            scaling_iters=0)
    assert np.isfinite(np.asarray(res.primal_res)).all()
