"""Self-defending-training machinery (round 4, VERDICT r3 #2/#6):

* epoch-scan crash -> per-batch fallback retry of the same epoch (the
  production trigger is an axon TPU-worker crash on 470-batch programs;
  here the failure is injected via ``harness._TEST_HOOKS``), and
* loss-spike rollback to the gated checkpoint (the bf16 TBPTT failure mode
  of QP_RHS epoch 174, artifacts/QP_RHS_full.json).
"""

import json
import os

import numpy as np

import iadmm_tpu as it
from iadmm_tpu.problems import generate
from iadmm_tpu.train import harness


def _cfg(tmp_path, **kw):
    base = dict(prob_type="QP", num_var=12, num_ineq=6, num_eq=6,
                data_size=20, hidden_dim=8, outer_T=4, truncated_length=2,
                batch_size=2, lr=2e-3, num_epoch=3, val_frac=0.1,
                test_frac=0.0, eq_tol=1e9, num_devices=1, scaling=True,
                preload="always", epoch_scan=True,
                save_dir=str(tmp_path))
    base.update(kw)
    return it.ExperimentConfig(**base)


def _read_log(tmp_path, cfg):
    path = os.path.join(str(tmp_path), cfg.model_name,
                        cfg.run_name() + ".log.jsonl")
    with open(path) as f:
        return [json.loads(l) for l in f]


def test_epoch_scan_crash_falls_back_to_per_batch(tmp_path):
    ds = generate("QP", num_var=12, num_ineq=6, num_eq=6, data_size=20,
                  seed=3)
    cfg = _cfg(tmp_path)
    harness._TEST_HOOKS["crash_first_epoch_scan"] = True
    try:
        res = harness.train(cfg, ds, verbose=False)
    finally:
        harness._TEST_HOOKS.clear()
    # the crashed epoch was retried: full history, finite losses
    assert res.epochs_run == cfg.num_epoch
    assert [h["epoch"] for h in res.history] == list(range(cfg.num_epoch))
    assert all(np.isfinite(h["train_loss"]) for h in res.history)
    kinds = [r["kind"] for r in _read_log(tmp_path, cfg)]
    assert "epoch_scan_crash" in kinds
    # ... and the downgrade matches the epoch-scan-free run exactly
    # (per-batch and whole-epoch updates are the same compiled math)
    cfg2 = _cfg(tmp_path, epoch_scan=False, save_dir=str(tmp_path / "b"))
    res2 = harness.train(cfg2, ds, verbose=False)
    np.testing.assert_allclose(
        [h["train_loss"] for h in res.history],
        [h["train_loss"] for h in res2.history], rtol=1e-5)


def test_loss_spike_rolls_back_to_gated_checkpoint(tmp_path):
    ds = generate("QP", num_var=12, num_ineq=6, num_eq=6, data_size=20,
                  seed=3)
    # factor 0.99: any epoch with loss >= ~recent median triggers once a
    # gated checkpoint exists (eq_tol=1e9 gates every epoch)
    cfg = _cfg(tmp_path, num_epoch=4, spike_rollback_factor=1e-6)
    res = harness.train(cfg, ds, verbose=False)
    recs = _read_log(tmp_path, cfg)
    assert any(r["kind"] == "spike_rollback" for r in recs)
    rollback_epochs = [h for h in res.history if h.get("rollback")]
    assert rollback_epochs, "expected at least one rollback-marked epoch"
    # training continued after the rollback and stayed finite
    assert res.epochs_run == cfg.num_epoch
    assert all(np.isfinite(h["train_loss"]) for h in res.history)


def test_per_batch_crash_retries_epoch(tmp_path):
    """The per-batch route has the same crash insurance: a transient
    failure retries the epoch from the host snapshot."""
    ds = generate("QP", num_var=12, num_ineq=6, num_eq=6, data_size=20,
                  seed=3)
    cfg = _cfg(tmp_path, epoch_scan=False)
    harness._TEST_HOOKS["crash_per_batch"] = True
    try:
        res = harness.train(cfg, ds, verbose=False)
    finally:
        harness._TEST_HOOKS.clear()
    assert res.epochs_run == cfg.num_epoch
    assert [h["epoch"] for h in res.history] == list(range(cfg.num_epoch))
    kinds = [r["kind"] for r in _read_log(tmp_path, cfg)]
    assert "per_batch_crash" in kinds
    # identical to an uncrashed run (snapshot restore is exact)
    cfg2 = _cfg(tmp_path, epoch_scan=False, save_dir=str(tmp_path / "c"))
    res2 = harness.train(cfg2, ds, verbose=False)
    np.testing.assert_allclose(
        [h["train_loss"] for h in res.history],
        [h["train_loss"] for h in res2.history], rtol=1e-6)


def test_latest_checkpoint_topup_resume(tmp_path):
    """A budget-bound run that never met the gate can still be resumed from
    the ``..._latest`` checkpoint (the gated best stays authoritative when
    newer)."""
    ds = generate("QP", num_var=12, num_ineq=6, num_eq=6, data_size=20,
                  seed=3)
    # eq_tol=0: gate can never pass -> no gated checkpoint
    cfg = _cfg(tmp_path, num_epoch=2, eq_tol=0.0)
    res1 = harness.train(cfg, ds, verbose=False)
    assert res1.checkpoint_path is None  # never gated
    cfg2 = _cfg(tmp_path, num_epoch=4, eq_tol=0.0, resume=True)
    res2 = harness.train(cfg2, ds, verbose=False)
    # continued from epoch 2, not from scratch
    assert [h["epoch"] for h in res2.history] == [2, 3]
    # and the loss continued the first run's trajectory (strictly fewer
    # epochs' worth of loss than a from-scratch 4-epoch run would log)
    assert res2.epochs_run == 4
