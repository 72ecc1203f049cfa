"""End-to-end CLI flow on CPU: generate -> train -> test -> export
(the reference's full README workflow, reference: README.md:32-44)."""

import os

import numpy as np

from iadmm_tpu.cli.generate_data import main as gen_main
from iadmm_tpu.cli.train import main as train_main
from iadmm_tpu.cli import test as cli_test


def test_full_cli_flow(tmp_path):
    root = str(tmp_path / "datasets")
    save = str(tmp_path / "results")
    common = ["--prob_type", "QP", "--num_var", "20", "--num_ineq", "10",
              "--num_eq", "10"]

    assert gen_main(common + ["--data_size", "24", "--seed", "3",
                              "--data_root", root, "--eps", "1e-3"]) == 0
    npz = os.path.join(root, "QP_20_10_10.npz")
    assert os.path.exists(npz)

    cfg_common = common + [
        "--data_size", "24", "--data_root", root, "--save_dir", save,
        "--hidden_dim", "16", "--outer_T", "6", "--truncated_length", "3",
        "--test_outer_T", "6", "--batch_size", "4", "--test_batch_size", "4",
        "--lr", "1e-3", "--val_frac", "0.25", "--test_frac", "0.25",
        "--eq_tol", "1e9", "--scaling", "true",
    ]
    assert train_main(cfg_common + ["--num_epoch", "2"]) == 0

    export = str(tmp_path / "traces.npz")
    assert cli_test.main(cfg_common + ["--feas_rest", "true",
                                   "--feas_rest_num", "3",
                                   "--baseline", "osqp",
                                   "--export", export]) == 0
    assert os.path.exists(export)
    tr = np.load(export)
    assert tr["objs"].shape == (6,)
    assert tr["stage2_primal_res"].shape == (3,)
    assert np.all(np.isfinite(tr["primal_res"]))
    # Stage-II polish must not blow up the primal residual.
    assert tr["stage2_primal_res"][-1] < max(1.0, tr["primal_res"][-1] * 2)


def test_mat_export(tmp_path):
    import scipy.io
    from iadmm_tpu.evaluation.driver import TestReport, export_traces
    rep = TestReport(obj=np.zeros(4), ls_res=np.ones(4),
                     primal_res=np.ones(4), dual_res=np.ones(4),
                     violations={"eq_max": np.ones(4)}, stage2=None,
                     total_time=1.0, parallel_time=0.1, test_size=10,
                     x_final=np.zeros((10, 3)))
    path = str(tmp_path / "out.mat")
    export_traces(rep, path)
    m = scipy.io.loadmat(path)
    assert m["objs"].size == 4 and m["x"].shape == (10, 3)


def test_oracle_gap_reporting(tmp_path):
    """run_test reports distance to stored ground-truth solutions."""
    import jax
    from iadmm_tpu.config import ExperimentConfig
    from iadmm_tpu.evaluation.driver import run_test
    from iadmm_tpu.problems import generators, oracle
    from iadmm_tpu.solvers.cells import lstm_init

    ds = generators.generate("QP", num_var=10, num_ineq=5, num_eq=5,
                             data_size=8, seed=6)
    oracle.label_dataset(ds, eps=1e-6)
    cfg = ExperimentConfig(prob_type="QP", num_var=10, num_ineq=5,
                           num_eq=5, data_size=8, hidden_dim=8, outer_T=3,
                           test_outer_T=3, test_batch_size=4, val_frac=0.0,
                           test_frac=1.0, feas_rest=True, feas_rest_num=30)
    params = lstm_init(jax.random.PRNGKey(0), 2, 8, 3)
    rep = run_test(cfg, ds, params, verbose=False)
    assert rep.oracle_gap is not None
    # 30 exact Stage-II steps from a random start must land near x*
    assert rep.oracle_gap["x_dist_mean"] < 0.3


def test_stage2_rho_override():
    """A fixed Stage-II rho converges the dual residual where a bad learned
    rho would not."""
    import jax
    from iadmm_tpu.config import ExperimentConfig
    from iadmm_tpu.evaluation.driver import run_test
    from iadmm_tpu.problems import generators
    from iadmm_tpu.solvers.cells import lstm_init

    ds = generators.generate("QP", num_var=10, num_ineq=5, num_eq=5,
                             data_size=8, seed=2)
    base = dict(prob_type="QP", num_var=10, num_ineq=5, num_eq=5,
                data_size=8, hidden_dim=8, outer_T=3, test_outer_T=3,
                test_batch_size=4, val_frac=0.0, test_frac=1.0,
                feas_rest=True, feas_rest_num=60)
    params = lstm_init(jax.random.PRNGKey(0), 2, 8, 3)
    # poison the learned rho: sigmoid(-12) ~ 6e-6 -> glacial dual updates
    params["rho"] = params["rho"] - 12.0
    rep_bad = run_test(ExperimentConfig(**base), ds, params, verbose=False)
    rep_fix = run_test(ExperimentConfig(stage2_rho=0.1, **base), ds,
                       params, verbose=False)
    assert rep_fix.stage2.dual_res[-1] < rep_bad.stage2.dual_res[-1] * 0.5
    assert rep_fix.stage2.primal_res[-1] < 1e-2
