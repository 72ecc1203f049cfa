"""Theory-condition traces (evaluation/theory.py): the reference's
commented-out inexactness analysis (main.py:900-946), implemented and
exported through the .mat schema."""

import numpy as np

import iadmm_tpu as it
from iadmm_tpu.problems import generate
from iadmm_tpu.evaluation.driver import run_test, export_traces
from iadmm_tpu.evaluation.theory import COND_KEYS, PER_INSTANCE_KEYS


def test_theory_traces_and_mat_export(tmp_path):
    ds = generate("QP", num_var=10, num_ineq=5, num_eq=5, data_size=10,
                  seed=4)
    cfg = it.ExperimentConfig(
        prob_type="QP", num_var=10, num_ineq=5, num_eq=5, data_size=10,
        hidden_dim=8, outer_T=6, test_outer_T=6, test_batch_size=2,
        val_frac=0.1, test_frac=0.4, eq_tol=1e9, num_devices=1,
        scaling=True, theory=True, save_dir=str(tmp_path))
    from iadmm_tpu.solvers.cells import lstm_init
    import jax
    params = lstm_init(jax.random.PRNGKey(0), 2, 8, 6)
    rep = run_test(cfg, ds, params, verbose=False)
    assert rep.theory is not None
    for k in COND_KEYS:
        v = rep.theory[k]
        # x_cond_2_* stay per-instance — (T, test_size) — matching the
        # reference's per-instance appends (main.py:913-915); the rest are
        # batch-mean scalars per t
        assert v.shape == ((6, 4) if k in PER_INSTANCE_KEYS else (6,)), k
        assert np.isnan(v[0]).all(), f"{k}[0] should be NaN (t=0 undefined)"
        assert np.isfinite(v[1:]).all(), k
    # conditions relate augmented-Lagrangian descent: left/right finite and
    # the z_cond_1 pair ordered the way a converging run tends to satisfy
    # is NOT asserted (untrained params) — schema and finiteness are.
    p = str(tmp_path / "out.mat")
    export_traces(rep, p)
    import scipy.io
    m = scipy.io.loadmat(p)
    assert m["x_cond_2_left"].shape == (6, 4)   # per-instance trace
    assert m["x_cond_1_left"].size == 6         # batch-mean trace
    assert m["x_cond_1_right"].size == 0        # never produced, schema-only
