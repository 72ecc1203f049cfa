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


def test_sparse_storage_roundtrip(tmp_path):
    """COO on-disk storage (density < 1/3) round-trips exactly."""
    from iadmm_tpu.problems.io import save_npz, load_npz
    ds = generate("Equality_QP", num_var=20, num_eq=10, data_size=3, seed=7)
    # force sparsity below the storage threshold
    ds.Q[:] = ds.Q * (np.random.default_rng(0).random(ds.Q.shape) < 0.2)
    ds.A0[:] = ds.A0 * (np.random.default_rng(1).random(ds.A0.shape) < 0.2)
    p = str(tmp_path / "sp.npz")
    save_npz(ds, p)
    with np.load(p) as f:
        assert "Q_sp_val" in f and "A0_sp_val" in f and "Q" not in f
    out = load_npz(p)
    np.testing.assert_array_equal(out.Q, ds.Q)
    np.testing.assert_array_equal(out.A0, ds.A0)


def test_sparse_harness_and_driver_match_dense(tmp_path):
    """cfg.sparse=True end-to-end: training runs and the eval driver's
    traces match the dense path."""
    import iadmm_tpu as it
    from iadmm_tpu.train import harness
    from iadmm_tpu.evaluation.driver import run_test

    ds = generate("Random_QP", num_var=12, num_ineq=18, data_size=8, seed=9)
    kw = dict(prob_type="Random_QP", num_var=12, num_ineq=18, data_size=8,
              hidden_dim=8, outer_T=4, truncated_length=2, batch_size=2,
              lr=2e-3, num_epoch=2, val_frac=0.25, test_frac=0.25,
              eq_tol=1e9, num_devices=1, scaling=True, preload="never",
              test_outer_T=4, test_batch_size=2, save_dir=str(tmp_path))
    res_sp = harness.train(it.ExperimentConfig(sparse=True, **kw),
                           ds, verbose=False)
    assert all(np.isfinite(h["train_loss"]) for h in res_sp.history)
    rep_sp = run_test(it.ExperimentConfig(sparse=True, **kw), ds,
                      res_sp.params, verbose=False)
    rep_d = run_test(it.ExperimentConfig(**kw), ds, res_sp.params,
                     verbose=False)
    np.testing.assert_allclose(rep_sp.primal_res, rep_d.primal_res,
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(rep_sp.dual_res, rep_d.dual_res,
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(rep_sp.obj, rep_d.obj, rtol=1e-4, atol=1e-6)


def test_bsr_step_matches_dense():
    """sparse_format='bsr' (tile-sparse Pallas matvecs, interpret mode on
    CPU) reproduces the dense learned step."""
    from iadmm_tpu.solvers.step import lstm_step as dense_step
    ds = generate("Random_QP", num_var=16, num_ineq=24, data_size=2, seed=5)
    data = to_qp_batch(ds, with_metric_views=False)
    bdata = sp.from_dense(data, fmt="bsr", tile=(8, 128), interpret=True)
    assert bdata.num_var == 16 and bdata.num_constr == 24
    params = lstm_init(jax.random.PRNGKey(0), 2, 8, 3)
    st = init_state(2, data.num_var, data.num_constr, 8)
    sigma = jnp.float32(6e-6)
    for t in range(2):
        ref = dense_step(params, t, st, data, sigma)
        out = sp.sparse_lstm_step(params, t, st, bdata, sigma)
        for name in ("x", "y", "z", "xv", "H", "C"):
            np.testing.assert_allclose(np.asarray(getattr(out, name)),
                                       np.asarray(getattr(ref, name)),
                                       rtol=1e-4, atol=1e-5, err_msg=name)
        st = ref


def test_bsr_harness_and_driver_match_dense(tmp_path):
    """cfg.sparse=True, sparse_format='bsr' end-to-end on the CPU interpret
    path: training runs and the eval traces match the dense path."""
    import iadmm_tpu as it
    from iadmm_tpu.train import harness
    from iadmm_tpu.evaluation.driver import run_test

    ds = generate("Random_QP", num_var=12, num_ineq=18, data_size=8, seed=9)
    kw = dict(prob_type="Random_QP", num_var=12, num_ineq=18, data_size=8,
              hidden_dim=8, outer_T=2, truncated_length=2, batch_size=2,
              lr=2e-3, num_epoch=1, val_frac=0.25, test_frac=0.25,
              eq_tol=1e9, num_devices=1, scaling=True, preload="never",
              test_outer_T=2, test_batch_size=2, save_dir=str(tmp_path))
    res = harness.train(it.ExperimentConfig(sparse=True, sparse_format="bsr",
                                            **kw), ds, verbose=False)
    assert all(np.isfinite(h["train_loss"]) for h in res.history)
    rep_b = run_test(it.ExperimentConfig(sparse=True, sparse_format="bsr",
                                         **kw), ds, res.params, verbose=False)
    rep_d = run_test(it.ExperimentConfig(**kw), ds, res.params, verbose=False)
    np.testing.assert_allclose(rep_b.primal_res, rep_d.primal_res,
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(rep_b.obj, rep_d.obj, rtol=1e-4, atol=1e-6)
