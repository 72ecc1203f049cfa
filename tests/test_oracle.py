import numpy as np

from iadmm_tpu.problems import generators, oracle


def test_oracle_solves_tiny_qp_against_kkt():
    """Equality-constrained QP has a closed-form KKT solution; the ADMM
    oracle must match it."""
    rng = np.random.default_rng(0)
    n, me = 8, 4
    M = rng.standard_normal((n, n))
    P = M @ M.T + 0.5 * np.eye(n)
    q = rng.standard_normal(n)
    A = rng.standard_normal((me, n))
    b = rng.standard_normal(me)

    res = oracle.solve_qp(P, q, A, b, b, eps_abs=1e-7, eps_rel=1e-7)
    assert res.solved

    K = np.block([[P, A.T], [A, np.zeros((me, me))]])
    sol = np.linalg.solve(K, np.concatenate([-q, b]))
    assert np.allclose(res.x, sol[:n], atol=1e-4)
    # oracle dual sign convention: Px + q + A^T y = 0
    assert np.max(np.abs(P @ res.x + q + A.T @ res.y)) < 1e-4


def test_oracle_box_constraints_active():
    """1D: min (x-2)^2 s.t. x <= 1 -> x* = 1."""
    P = np.array([[2.0]])
    q = np.array([-4.0])
    A = np.array([[1.0]])
    res = oracle.solve_qp(P, q, A, np.array([-np.inf]), np.array([1.0]),
                          eps_abs=1e-7, eps_rel=1e-7)
    assert res.solved
    assert abs(res.x[0] - 1.0) < 1e-4
    assert res.y[0] > 0  # active constraint has positive multiplier


def test_label_dataset_residuals(tiny_qp):
    ds = tiny_qp.slice(np.arange(3))
    solved = oracle.label_dataset(ds, eps=1e-5)
    assert len(solved) == 3
    for i in solved:
        P = ds.Q[i] * 2
        pri = np.abs(ds.A0[i] @ ds.x_opt[i]
                     - np.clip(ds.A0[i] @ ds.x_opt[i], ds.zl[i], ds.zu[i]))
        dua = np.abs(P @ ds.x_opt[i] + ds.p[i] + ds.A0[i].T @ ds.y_opt[i])
        assert pri.max() < 1e-3
        assert dua.max() < 1e-3
