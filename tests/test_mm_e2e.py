"""Maros-Mészáros prob_type end-to-end (VERDICT r4 #8): a REAL vendored MM
instance (HS35, exact published data — problems/mm_vendor.py) written in
the reference's per-instance gz-pickle schema, loaded through the generic
``MM_*`` loader path (problems/io.py load_dataset, mirroring the
reference's main.py:118-167, 215-296), trained for 2 epochs, and
evaluated against both the oracle labels and HS35's published optimum."""

import numpy as np
import pytest

import iadmm_tpu as it
from iadmm_tpu.problems import io
from iadmm_tpu.problems import mm_vendor
from iadmm_tpu.train import harness
from iadmm_tpu.evaluation.driver import run_test


@pytest.fixture(scope="module")
def mm_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("mmdata")
    d = mm_vendor.write_family(str(root), data_size=16, seed=17)
    assert d.endswith("MM_HS35")
    return str(root)


def test_vendored_instance_matches_published_optimum(mm_root):
    """Instance 0 is the exact published HS35; the oracle label must hit
    the published solution x* = (4/3, 7/9, 4/9), f* − 9 = 1/9 − 9."""
    ds = io.load_dataset(mm_root, "MM_HS35", 3, data_size=16)
    assert ds.size == 16 and ds.Q.shape[-1] == 3 and ds.A0.shape[-2] == 4
    np.testing.assert_allclose(ds.x_opt[0], mm_vendor.HS35_X_OPT, atol=2e-3)
    Qh = 2.0 * ds.Q[0]
    obj = 0.5 * ds.x_opt[0] @ Qh @ ds.x_opt[0] + ds.p[0] @ ds.x_opt[0]
    np.testing.assert_allclose(obj, mm_vendor.HS35_OBJ, atol=1e-3)


def test_mm_train_eval_smoke(mm_root, tmp_path):
    """2-epoch train + eval through the MM_* pipeline (loader -> scaling ->
    TBPTT harness -> test driver with oracle gap)."""
    ds = io.load_dataset(mm_root, "MM_HS35", 3, data_size=16)
    cfg = it.ExperimentConfig(
        prob_type="MM_HS35", num_var=3, num_ineq=4, data_size=16,
        hidden_dim=8, outer_T=6, truncated_length=3, batch_size=2,
        lr=1e-3, num_epoch=2, val_frac=0.125, test_frac=0.25, eq_tol=1e9,
        num_devices=1, scaling=True, test_outer_T=6, test_batch_size=2,
        save_dir=str(tmp_path))
    res = harness.train(cfg, ds, verbose=False)
    assert res.epochs_run == 2
    assert all(np.isfinite(h["train_loss"]) for h in res.history)
    rep = run_test(cfg, ds, res.params, verbose=False)
    assert np.isfinite(rep.obj[-1])
    assert rep.oracle_gap is not None
    assert np.isfinite(rep.oracle_gap["obj_gap_mean"])


def test_committed_mm_family_loads():
    """The vendored gz files committed under datasets/MM_HS35 load through
    the MM_* path (guards the committed artifact, not just the writer)."""
    import os
    root = os.path.join(os.path.dirname(__file__), "..", "datasets")
    if not os.path.isdir(os.path.join(root, "MM_HS35")):
        pytest.skip("vendored MM_HS35 not present")
    ds = io.load_dataset(root, "MM_HS35", 3, data_size=16)
    assert ds.size == 16
    np.testing.assert_allclose(ds.x_opt[0], mm_vendor.HS35_X_OPT, atol=2e-3)
