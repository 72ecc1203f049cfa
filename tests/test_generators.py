import numpy as np
import jax.numpy as jnp
import pytest

from iadmm_tpu.problems import generators, io


@pytest.mark.parametrize("family,kw", [
    ("QP", dict(num_var=20, num_ineq=10, num_eq=10)),
    ("QP_RHS", dict(num_var=20, num_ineq=10, num_eq=10)),
    ("Random_QP", dict(num_var=16, num_ineq=24)),
    ("Equality_QP", dict(num_var=16, num_eq=8)),
    ("SVM", dict(num_var=12, num_ineq=8)),
])
def test_family_shapes_and_masks(family, kw):
    ds = generators.generate(family, data_size=4, seed=1, **kw)
    N = 4
    # shared-data families store dim-1 matrices (QP_RHS)
    assert ds.Q.shape[0] in (N, 1)
    assert ds.size == N
    n = ds.Q.shape[-1]
    m = ds.A0.shape[-2]
    assert ds.p.shape[-1] == n and ds.p.shape[0] in (N, 1)
    assert ds.zl.shape == (N, m) and ds.zu.shape == (N, m)
    assert np.all(ds.zl <= ds.zu)
    # Q half-Hessian must be symmetric PSD.
    sym_err = np.abs(ds.Q - np.swapaxes(ds.Q, -1, -2)).max()
    assert sym_err < 1e-12
    eigs = np.linalg.eigvalsh(ds.Q + 1e-9 * np.eye(n))
    assert eigs.min() > -1e-8

    batch = io.to_qp_batch(ds)
    # doubled Hessian convention
    assert np.allclose(np.asarray(batch.Q), ds.Q * 2, rtol=1e-6)
    # eq_mask equals finite zl == zu rows
    expect = (ds.zl == ds.zu) & np.isfinite(ds.zl)
    assert np.array_equal(np.asarray(batch.eq_mask), expect)
    if family in ("QP", "QP_RHS"):
        # first mi rows ineq, last me rows eq — reference layout
        mi, me = kw["num_ineq"], kw["num_eq"]
        assert not expect[:, :mi].any()
        assert expect[:, mi:mi + me].all()
    if family == "Equality_QP":
        assert expect.all()
    if family in ("SVM", "Random_QP"):
        assert not expect.any()


def test_qp_rhs_shares_lhs():
    ds = generators.generate("QP_RHS", num_var=10, num_ineq=5, num_eq=5,
                             data_size=3, seed=2)
    # shared LHS stored ONCE (dim-1), per-instance RHS b
    assert ds.Q.shape[0] == 1 and ds.A0.shape[0] == 1
    assert ds.b.shape[0] == 3
    assert not np.allclose(ds.b[0], ds.b[1])
    # device batch broadcasts shared leaves to the instance count
    batch = io.to_qp_batch(ds)
    assert batch.Q.shape[0] == 3
    assert np.allclose(np.asarray(batch.Q[0]), np.asarray(batch.Q[2]))
    # slicing keeps shared leaves shared
    sub = ds.slice(np.asarray([0, 2]))
    assert sub.Q.shape[0] == 1 and sub.zl.shape[0] == 2
    # oracle labeling flows through the shared-data fast path
    from iadmm_tpu.problems import oracle
    ids = oracle.label_dataset(ds, eps=1e-5)
    assert len(ids) == 3


def test_qp_feasibility_trick():
    """c = sum_cols |G pinv(A)| guarantees x = pinv(A) b is feasible."""
    ds = generators.generate("QP", num_var=20, num_ineq=10, num_eq=10,
                             data_size=2, seed=5)
    for i in range(2):
        x_feas = np.linalg.pinv(ds.A[i]) @ ds.b[i]
        assert np.all(ds.G[i] @ x_feas <= ds.c[i] + 1e-9)
        assert np.allclose(ds.A[i] @ x_feas, ds.b[i], atol=1e-9)


def test_npz_roundtrip(tmp_path, tiny_qp):
    path = str(tmp_path / "ds.npz")
    io.save_npz(tiny_qp, path)
    back = io.load_npz(path)
    assert back.prob_type == tiny_qp.prob_type
    assert np.array_equal(back.Q, tiny_qp.Q)
    assert np.array_equal(back.zl, tiny_qp.zl)
    assert np.array_equal(back.G, tiny_qp.G)


def test_split_ids_reference_shuffle():
    """Same stdlib shuffle as reference main.py:171-183 with seed 17."""
    tr, va, te = io.split_ids(100, 0.1, 0.1, seed=17)
    assert len(tr) == 80 and len(va) == 10 and len(te) == 10
    assert len(set(tr) | set(va) | set(te)) == 100
    tr2, _, _ = io.split_ids(100, 0.1, 0.1, seed=17)
    assert np.array_equal(tr, tr2)


def test_portfolio_family():
    """Portfolio family: PSD factor-model Q, budget equality, box rows,
    and oracle solvability."""
    from iadmm_tpu.problems import generators, oracle
    from iadmm_tpu.problems.io import to_qp_batch
    import numpy as np

    ds = generators.generate("Portfolio", num_var=20, num_ineq=4,
                             data_size=4, seed=3)
    assert ds.Q.shape == (4, 20, 20)
    assert ds.A0.shape == (4, 21, 20)
    # PSD check
    w = np.linalg.eigvalsh(ds.Q[0])
    assert w.min() > 0
    # budget row is an equality
    data = to_qp_batch(ds)
    assert bool(data.eq_mask[0, 0]) and not bool(data.eq_mask[0, 1])
    ids = oracle.label_dataset(ds, eps=1e-5)
    assert len(ids) == 4
    # solutions satisfy budget + long-only within tolerance
    assert np.allclose(ds.x_opt.sum(-1), 1.0, atol=1e-3)
    assert (ds.x_opt >= -1e-4).all()


def test_sparse_qp_family_is_genuinely_sparse():
    """Sparse_QP at canonical n must be <10% dense (the device-sparse-path
    demo workload, unlike the ~50%-mask reference families) and PSD."""
    ds = generators.generate("Sparse_QP", num_var=1000, num_ineq=500,
                             data_size=1, seed=3)
    q_density = float((np.asarray(ds.Q[0]) != 0).mean())
    a_density = float((np.asarray(ds.A0[0]) != 0).mean())
    assert q_density < 0.10, q_density
    assert a_density < 0.10, a_density
    # PSD with the 0.005 diagonal floor
    ev_min = float(np.linalg.eigvalsh(
        np.asarray(ds.Q[0], np.float64)).min())
    assert ev_min > 0
    assert ds.prob_type == "Sparse_QP"
