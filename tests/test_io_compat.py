"""Dataset IO: npz round-trip and reference gz-pickle compatibility."""

import gzip
import os
import pickle

import numpy as np

from iadmm_tpu.problems import generators, io


def test_npz_roundtrip(tmp_path):
    ds = generators.generate("SVM", num_var=8, num_ineq=6, data_size=3,
                             seed=1)
    path = str(tmp_path / "svm.npz")
    io.save_npz(ds, path)
    back = io.load_npz(path)
    np.testing.assert_array_equal(back.Q, ds.Q)
    np.testing.assert_array_equal(back.zl, ds.zl)
    np.testing.assert_array_equal(back.lb, ds.lb)
    assert back.A is None  # SVM has no equality view


def test_reference_gz_pickle_loader(tmp_path):
    """Per-instance gzip pickles in the reference's on-disk layout
    (reference: main.py:200-296), including scipy-sparse matrices that must
    be densified on load (reference: main.py:243-245)."""
    from scipy.sparse import csc_matrix
    rng = np.random.default_rng(0)
    n, mi, me = 6, 4, 3
    m = mi + me
    for i in range(3):
        Q = np.diag(rng.random(n))
        G = rng.standard_normal((mi, n))
        A = rng.standard_normal((me, n))
        inst = {
            "Q": Q, "p": rng.random((n, 1)),
            "G": csc_matrix(G), "c": rng.random((mi, 1)),
            "A": csc_matrix(A), "b": rng.random((me, 1)),
            "A0": csc_matrix(np.vstack([G, A])),
            "zl": rng.random((m, 1)), "zu": rng.random((m, 1)) + 2.0,
            "x": rng.random((n, 1)), "y": rng.random((m, 1)),
        }
        with gzip.open(os.path.join(tmp_path, f"QP_{i}.gz"), "wb") as f:
            pickle.dump(inst, f)

    ds = io.load_reference_gz_dir(str(tmp_path), "QP", range(3))
    assert ds.Q.shape == (3, n, n)
    assert ds.A0.shape == (3, m, n)
    assert ds.p.shape == (3, n)          # trailing singleton squeezed
    assert ds.x_opt.shape == (3, n)      # ground-truth labels picked up
    # densified sparse == original dense
    batch = io.to_qp_batch(ds)
    assert float(np.abs(np.asarray(batch.Q[0]) / 2.0 - ds.Q[0]).max()) < 1e-6


def test_load_dataset_reference_gz_fallback(tmp_path):
    """load_dataset without a stacked npz must find the reference's own
    directory layout, whose file names are LOWERCASE
    (reference: main.py:204-216 — 'qp_{}.gz' for prob_type 'QP')."""
    ds = generators.generate("QP", num_var=6, num_ineq=4, num_eq=3,
                             data_size=2, seed=3)
    d = str(tmp_path / "QP_6_4_3")
    io.save_reference_gz_dir(ds, d, "qp")   # reference naming
    back = io.load_dataset(str(tmp_path), "QP", 6, 4, 3, data_size=2)
    np.testing.assert_allclose(back.Q, ds.Q, rtol=1e-12)
    np.testing.assert_allclose(back.A0, ds.A0, rtol=1e-12)


def test_all_families_generate_and_batch():
    for fam in generators.FAMILIES:
        kw = dict(num_var=10, data_size=2, seed=1)
        if fam in ("QP", "QP_RHS"):
            kw.update(num_ineq=4, num_eq=4)
        elif fam in ("Random_QP", "SVM"):
            kw.update(num_ineq=6)
        elif fam == "Equality_QP":
            kw.update(num_eq=5)
        elif fam == "Portfolio":
            kw.update(num_ineq=3)
        ds = generators.generate(fam, **kw)
        batch = io.to_qp_batch(ds)
        assert batch.Q.shape[0] == 2
        assert np.isfinite(np.asarray(batch.p)).all()


def test_qplib_loader(tmp_path):
    """QPLIB family loads from the reference's qplib_<num>_<i>.gz layout
    (reference: main.py:111-117, 213-214)."""
    import gzip, pickle
    rng = np.random.default_rng(1)
    n, m = 5, 4
    d = tmp_path / "QPLIB_8845"
    d.mkdir()
    for i in range(3):
        inst = {"Q": np.diag(rng.random(n)), "p": rng.random((n, 1)),
                "A0": rng.standard_normal((m, n)),
                "zl": rng.random((m, 1)), "zu": rng.random((m, 1)) + 1.0}
        with gzip.open(d / f"qplib_8845_{i}.gz", "wb") as f:
            pickle.dump(inst, f)
    ds = io.load_dataset(str(tmp_path), "QPLIB", qplib_num=8845,
                         data_size=3)
    assert ds.Q.shape == (3, n, n) and ds.A0.shape == (3, m, n)

    from iadmm_tpu.config import ExperimentConfig
    cfg = ExperimentConfig(prob_type="QPLIB", qplib_num=8845)
    assert cfg.run_name().startswith("QPLIB_8845")


def test_maros_meszaros_loader(tmp_path):
    """MM_* families load from the reference's <name>_<i>.gz layout
    (reference: main.py:118-167, 215-229)."""
    import gzip, pickle
    rng = np.random.default_rng(5)
    n, m = 4, 3
    d = tmp_path / "MM_MOSARQP2"
    d.mkdir()
    for i in range(2):
        inst = {"Q": np.diag(rng.random(n)), "p": rng.random((n, 1)),
                "A0": rng.standard_normal((m, n)),
                "zl": rng.random((m, 1)), "zu": rng.random((m, 1)) + 1.0}
        with gzip.open(d / f"mosarqp2_{i}.gz", "wb") as f:
            pickle.dump(inst, f)
    ds = io.load_dataset(str(tmp_path), "MM_MOSARQP2", data_size=2)
    assert ds.Q.shape == (2, n, n)
    from iadmm_tpu.config import ExperimentConfig
    cfg = ExperimentConfig(prob_type="MM_MOSARQP2", num_var=n, outer_T=100,
                           hidden_dim=800)
    # num_var is part of the key so MM perturbation runs that differ only
    # in size can't overwrite each other's checkpoints (VERDICT round 1).
    assert cfg.run_name() == f"MM_MOSARQP2_{n}_100_800"
