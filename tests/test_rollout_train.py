"""Rollout, TBPTT chunking, and end-to-end small-config training on CPU."""

import numpy as np
import jax
import jax.numpy as jnp

from iadmm_tpu.config import ExperimentConfig
from iadmm_tpu.problems import generators, io
from iadmm_tpu.types import init_state
from iadmm_tpu.solvers import step as step_mod
from iadmm_tpu.solvers import rollouts as rollout_mod
from iadmm_tpu.solvers.cells import lstm_init
from iadmm_tpu.evaluation import metrics
from iadmm_tpu.train import harness

SIGMA = 6e-6


def test_scan_rollout_matches_python_loop(tiny_qp):
    data = io.to_qp_batch(tiny_qp, dtype=jnp.float64)
    params = lstm_init(jax.random.PRNGKey(0), 2, 8, length=6,
                       dtype=jnp.float64)
    st0 = init_state(data.batch, data.num_var, data.num_constr, 8,
                     dtype=jnp.float64)
    scanned = rollout_mod.rollout(step_mod.lstm_step, params, st0, data,
                                  SIGMA, num_iters=6)
    st = st0
    for t in range(6):
        st = step_mod.lstm_step(params, t, st, data, SIGMA)
    assert np.allclose(np.asarray(scanned.x), np.asarray(st.x), rtol=1e-12)
    assert np.allclose(np.asarray(scanned.H), np.asarray(st.H), rtol=1e-12)


def test_chunk_loss_matches_manual(tiny_qp):
    data = io.to_qp_batch(tiny_qp, dtype=jnp.float64)
    params = lstm_init(jax.random.PRNGKey(0), 2, 8, length=4,
                       dtype=jnp.float64)
    st0 = init_state(data.batch, data.num_var, data.num_constr, 8,
                     dtype=jnp.float64)
    loss, _ = rollout_mod.chunk_loss(step_mod.lstm_step, params, st0, data,
                                     SIGMA, chunk_len=4, outer_T=4, t0=0)
    st, total = st0, 0.0
    for t in range(4):
        st = step_mod.lstm_step(params, t, st, data, SIGMA)
        _, _, l = metrics.primal_dual_loss(st.x, st.y, st.z, data)
        total += float(l.mean()) / 4
    assert abs(float(loss) - total) < 1e-9


def test_tbptt_stops_gradient_between_chunks(tiny_qp):
    """Gradients of chunk 2 w.r.t. params must treat the chunk-1 final state
    as a constant (reference detach semantics, main.py:353-358)."""
    data = io.to_qp_batch(tiny_qp, dtype=jnp.float64)
    params = lstm_init(jax.random.PRNGKey(0), 2, 8, length=4,
                       dtype=jnp.float64)
    st0 = init_state(data.batch, data.num_var, data.num_constr, 8,
                     dtype=jnp.float64)

    # Full-rollout gradient (no truncation)
    def full_loss(p):
        l, _ = rollout_mod.chunk_loss(step_mod.lstm_step, p, st0, data,
                                      SIGMA, chunk_len=4, outer_T=4, t0=0)
        return l

    # Two truncated chunks with an intervening stop (jit boundary emulated
    # by stop_gradient on the carried state).
    def trunc_loss(p):
        l1, st1 = rollout_mod.chunk_loss(step_mod.lstm_step, p, st0, data,
                                         SIGMA, chunk_len=2, outer_T=4, t0=0)
        st1 = jax.tree.map(jax.lax.stop_gradient, st1)
        l2, _ = rollout_mod.chunk_loss(step_mod.lstm_step, p, st1, data,
                                       SIGMA, chunk_len=2, outer_T=4, t0=2)
        return l1 + l2

    gf = jax.grad(lambda p: full_loss(p))(params)
    gt = jax.grad(lambda p: trunc_loss(p))(params)
    # Losses identical in value, gradients must differ (truncation bites).
    assert abs(float(full_loss(params)) - float(trunc_loss(params))) < 1e-10
    diff = np.abs(np.asarray(gf["W"]) - np.asarray(gt["W"])).max()
    assert diff > 0.0


def test_small_config_training_reduces_loss():
    """BASELINE.json configs[0]-style CPU-runnable e2e: loss and residuals
    must drop over a few epochs."""
    ds = generators.generate("QP", num_var=30, num_ineq=15, num_eq=15,
                             data_size=24, seed=11)
    cfg = ExperimentConfig(
        prob_type="QP", num_var=30, num_ineq=15, num_eq=15, data_size=24,
        hidden_dim=16, outer_T=8, truncated_length=4, batch_size=4,
        lr=5e-3, num_epoch=6, val_frac=0.25, test_frac=0.0,
        scaling=True, scaling_ites=10, sigma=6e-6, patience=100,
        eq_tol=1e9, save_dir="/tmp/iadmm_test_results", log_every=100)
    res = harness.train(cfg, ds, verbose=False)
    losses = [h["train_loss"] for h in res.history]
    assert len(losses) == 6
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


def test_eval_rollout_traces(tiny_qp):
    from iadmm_tpu.scaling import scale_batch
    data_orig = io.to_qp_batch(tiny_qp, dtype=jnp.float64)
    data_scaled, sc = scale_batch(data_orig, iters=10)
    params = lstm_init(jax.random.PRNGKey(0), 2, 8, length=5,
                       dtype=jnp.float64)
    st0 = init_state(data_orig.batch, data_orig.num_var,
                     data_orig.num_constr, 8, dtype=jnp.float64)
    final, trace = rollout_mod.eval_rollout(
        step_mod.lstm_step, params, st0, data_scaled, data_orig, sc,
        SIGMA, num_iters=5)
    assert trace.obj.shape == (5,)
    assert trace.primal_res.shape == (5,)
    assert np.all(np.isfinite(np.asarray(trace.ls_res)))
    assert "ineq_max" in trace.violations
    assert "eq_max" in trace.violations
    # Stage II from the unscaled state should not blow up
    rho_vec = step_mod.rho_vector(
        jax.nn.sigmoid(params["rho"][4]), data_orig.eq_mask)
    st_u = rollout_mod.unscale_state(final, sc)
    _, tr2 = rollout_mod.eval_stage2(st_u, data_orig, data_orig, None,
                                     SIGMA, rho_vec, num_iters=4)
    assert np.all(np.isfinite(np.asarray(tr2.primal_res)))
    # exact polish should reduce the primal residual
    assert float(tr2.primal_res[-1]) < float(trace.primal_res[-1]) * 2


def test_train_resume(tmp_path):
    """Epoch-level resume restores params/opt_state/epoch counter."""
    import os
    from iadmm_tpu.config import ExperimentConfig
    from iadmm_tpu.problems import generators
    from iadmm_tpu.train import harness

    ds = generators.generate("QP", num_var=10, num_ineq=5, num_eq=5,
                             data_size=16, seed=2)
    kw = dict(prob_type="QP", num_var=10, num_ineq=5, num_eq=5,
              data_size=16, hidden_dim=8, outer_T=3, truncated_length=3,
              batch_size=4, lr=1e-3, val_frac=0.25, test_frac=0.0,
              eq_tol=1e9, save_dir=str(tmp_path))
    r1 = harness.train(ExperimentConfig(num_epoch=2, **kw), ds,
                       verbose=False)
    assert r1.checkpoint_path and os.path.exists(r1.checkpoint_path)
    r2 = harness.train(ExperimentConfig(num_epoch=4, resume=True, **kw),
                       ds, verbose=False)
    # resumed from epoch 2 -> only 2 additional epochs recorded
    assert r2.history[0]["epoch"] >= 2
    assert r2.epochs_run == 4
