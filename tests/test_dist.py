"""Multi-device data-parallel correctness on a faked 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iadmm_tpu import dist
from iadmm_tpu.problems import generators, io
from iadmm_tpu.types import init_state
from iadmm_tpu.solvers import step as step_mod
from iadmm_tpu.solvers import rollouts as rollout_mod
from iadmm_tpu.solvers.cells import lstm_init
from iadmm_tpu.train import harness

SIGMA = 6e-6

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _data_and_params(B=8, hidden=8, T=4):
    ds = generators.generate("QP", num_var=16, num_ineq=8, num_eq=8,
                             data_size=B, seed=13)
    data = io.to_qp_batch(ds, dtype=jnp.float64)
    params = lstm_init(jax.random.PRNGKey(0), 2, hidden, length=T,
                       dtype=jnp.float64)
    st = init_state(B, data.num_var, data.num_constr, hidden,
                    dtype=jnp.float64)
    return data, params, st


def test_sharded_rollout_matches_single_device():
    data, params, st = _data_and_params()
    ref = rollout_mod.rollout(step_mod.lstm_step, params, st, data,
                              SIGMA, num_iters=4)

    mesh = dist.make_mesh(8)
    data_s = dist.shard_batch(data, mesh)
    st_s = dist.shard_batch(st, mesh)
    params_r = dist.replicate(params, mesh)
    out = jax.jit(lambda p, s, d: rollout_mod.rollout(
        step_mod.lstm_step, p, s, d, SIGMA, num_iters=4))(
            params_r, st_s, data_s)
    assert np.allclose(np.asarray(out.x), np.asarray(ref.x),
                       rtol=1e-10, atol=1e-12)
    assert np.allclose(np.asarray(out.y), np.asarray(ref.y),
                       rtol=1e-10, atol=1e-12)


def test_dp_gradients_match_single_device():
    """Data-parallel chunk gradient == single-device gradient (the psum XLA
    inserts must average exactly)."""
    data, params, st = _data_and_params()

    def loss_fn(p, s, d):
        l, _ = rollout_mod.chunk_loss(step_mod.lstm_step, p, s, d, SIGMA,
                                      chunk_len=4, outer_T=4, t0=0)
        return l

    g_ref = jax.grad(loss_fn)(params, st, data)

    mesh = dist.make_mesh(8)
    data_s = dist.shard_batch(data, mesh)
    st_s = dist.shard_batch(st, mesh)
    params_r = dist.replicate(params, mesh)
    g_dp = jax.jit(jax.grad(loss_fn))(params_r, st_s, data_s)
    for k in g_ref:
        assert np.allclose(np.asarray(g_dp[k]), np.asarray(g_ref[k]),
                           rtol=1e-8, atol=1e-10), k


def test_train_chunk_runs_sharded():
    import optax
    data, params, st = _data_and_params()
    optimizer = harness.make_optimizer(1e-3)
    opt_state = optimizer.init(params)
    chunk = harness.make_train_chunk(step_mod.lstm_step, optimizer,
                                     outer_T=4, chunk_len=4, sigma=SIGMA)
    mesh = dist.make_mesh(8)
    params2, opt2, st2, loss = chunk(
        dist.replicate(params, mesh),
        dist.replicate(opt_state, mesh),
        dist.shard_batch(st, mesh),
        dist.shard_batch(data, mesh),
        jnp.asarray(0, jnp.int32))
    assert np.isfinite(float(loss))
    # sharding survived the step
    shards = params2["W"].sharding
    assert shards.is_fully_replicated


def test_harness_trains_sharded(tmp_path):
    """End-to-end harness.train with an 8-way data-parallel mesh."""
    from iadmm_tpu.config import ExperimentConfig
    from iadmm_tpu.problems.oracle import label_dataset
    from iadmm_tpu.problems import generators

    ds = generators.generate("QP", num_var=12, num_ineq=6, num_eq=6,
                             data_size=40, seed=7)
    cfg = ExperimentConfig(
        prob_type="QP", num_var=12, num_ineq=6, num_eq=6, data_size=40,
        hidden_dim=8, outer_T=4, truncated_length=2, batch_size=16,
        lr=1e-3, num_epoch=2, val_frac=0.2, test_frac=0.2, eq_tol=1e9,
        num_devices=8, save_dir=str(tmp_path))
    res = harness.train(cfg, ds, verbose=False)
    assert res.epochs_run == 2
    assert np.isfinite(res.history[-1]["train_loss"])


def test_epoch_scan_sharded_matches_single_device(tmp_path):
    """The preload + whole-epoch-scan fast path must survive a data-parallel
    mesh (VERDICT r1 #6): preload='always' with n_batches>=8 routes both runs
    through make_train_epoch; the 8-way sharded loss history must equal the
    single-device one (the stacked leaves are P(None, 'data')-sharded, the
    scan slices the batch axis)."""
    from iadmm_tpu.config import ExperimentConfig
    from iadmm_tpu.problems import generators

    ds = generators.generate("QP", num_var=12, num_ineq=6, num_eq=6,
                             data_size=100, seed=5)
    kw = dict(prob_type="QP", num_var=12, num_ineq=6, num_eq=6,
              data_size=100, hidden_dim=8, outer_T=4, truncated_length=2,
              batch_size=8, lr=1e-3, num_epoch=2, val_frac=0.1,
              test_frac=0.1, eq_tol=1e9, preload="always", scaling=True)
    res_dp = harness.train(
        ExperimentConfig(num_devices=8, save_dir=str(tmp_path / "dp"), **kw),
        ds, verbose=False)
    res_1 = harness.train(
        ExperimentConfig(num_devices=1, save_dir=str(tmp_path / "sd"), **kw),
        ds, verbose=False)
    l_dp = [h["train_loss"] for h in res_dp.history]
    l_1 = [h["train_loss"] for h in res_1.history]
    np.testing.assert_allclose(l_dp, l_1, rtol=1e-4)


def test_harness_trains_tensor_parallel(tmp_path):
    """model_devices=2 over the 8-device mesh (data=4 x model=2) matches
    the single-device loss history: the TP layout only changes WHERE the
    gate matmuls run, GSPMD's collectives must not change the math."""
    from iadmm_tpu.config import ExperimentConfig
    from iadmm_tpu.problems import generators

    ds = generators.generate("QP", num_var=12, num_ineq=6, num_eq=6,
                             data_size=24, seed=11)
    kw = dict(prob_type="QP", num_var=12, num_ineq=6, num_eq=6,
              data_size=24, hidden_dim=8, outer_T=4, truncated_length=2,
              batch_size=4, lr=1e-3, num_epoch=2, val_frac=0.2,
              test_frac=0.2, eq_tol=1e9, preload="never")
    res_tp = harness.train(
        ExperimentConfig(num_devices=8, model_devices=2,
                         save_dir=str(tmp_path / "tp"), **kw),
        ds, verbose=False)
    res_1 = harness.train(
        ExperimentConfig(num_devices=1, save_dir=str(tmp_path / "sd"), **kw),
        ds, verbose=False)
    l_tp = [h["train_loss"] for h in res_tp.history]
    l_1 = [h["train_loss"] for h in res_1.history]
    np.testing.assert_allclose(l_tp, l_1, rtol=1e-4)


def test_tp_shard_params_layout():
    """Gate weights land split over 'model'; schedules stay replicated."""
    mesh = dist.make_mesh(8, model_axis=2)
    params = lstm_init(jax.random.PRNGKey(0), 2, 8, length=4)
    sharded = dist.tp_shard_params(params, mesh)
    assert not sharded["U"].sharding.is_fully_replicated
    assert not sharded["W_h"].sharding.is_fully_replicated
    assert sharded["rho"].sharding.is_fully_replicated
    # optax-style nested state with the same dict keys gets the same layout
    nested = {"mu": {k: jnp.zeros_like(v) for k, v in params.items()}}
    sh2 = dist.tp_shard_params(nested, mesh)
    assert not sh2["mu"]["U"].sharding.is_fully_replicated
    assert sh2["mu"]["rho"].sharding.is_fully_replicated


def test_remat_chunk_matches_no_remat():
    data, params, st = _data_and_params()

    def loss(p, remat):
        l, _ = rollout_mod.chunk_loss(step_mod.lstm_step, p, st, data,
                                      SIGMA, chunk_len=4, outer_T=4, t0=0,
                                      remat=remat)
        return l

    g0 = jax.grad(lambda p: loss(p, False))(params)
    g1 = jax.grad(lambda p: loss(p, True))(params)
    for k in g0:
        assert np.allclose(np.asarray(g0[k]), np.asarray(g1[k]),
                           rtol=1e-12, atol=1e-14), k


def test_run_test_sharded(tmp_path):
    """Scenario-parallel eval over the 8-device mesh."""
    from iadmm_tpu.config import ExperimentConfig
    from iadmm_tpu.evaluation.driver import run_test
    from iadmm_tpu.solvers.cells import lstm_init
    from iadmm_tpu.problems import generators

    ds = generators.generate("QP", num_var=12, num_ineq=6, num_eq=6,
                             data_size=32, seed=8)
    cfg = ExperimentConfig(prob_type="QP", num_var=12, num_ineq=6, num_eq=6,
                           data_size=32, hidden_dim=8, outer_T=3,
                           test_outer_T=3, test_batch_size=16,
                           val_frac=0.0, test_frac=1.0, num_devices=8)
    params = lstm_init(jax.random.PRNGKey(0), 2, 8, 3)
    rep = run_test(cfg, ds, params, verbose=False)
    assert rep.obj.shape == (3,)
    assert np.isfinite(rep.primal_res).all()
    cfg1 = ExperimentConfig(**{**cfg.to_dict(), "num_devices": 1})
    rep1 = run_test(cfg1, ds, params, verbose=False)
    np.testing.assert_allclose(rep.primal_res, rep1.primal_res,
                               rtol=1e-6, atol=1e-9)


def test_sparse_dp_matches_single_device(tmp_path):
    """sparse=True composes with data parallelism (VERDICT r4 #4): the
    shard_map route (kernels/sparse.make_sparse_chunk_loss) over the
    8-device mesh must reproduce the single-device sparse loss history,
    for both BCOO and BSR (interpret) formats."""
    from iadmm_tpu.config import ExperimentConfig
    from iadmm_tpu.problems import generators

    ds = generators.generate("Sparse_QP", num_var=32, num_ineq=16,
                             data_size=32, seed=3, bandwidth=4)
    for fmt in ("bcoo", "bsr"):
        kw = dict(prob_type="Sparse_QP", num_var=32, num_ineq=16,
                  data_size=32, hidden_dim=8, outer_T=4,
                  truncated_length=2, batch_size=8, lr=1e-3, num_epoch=2,
                  val_frac=0.125, test_frac=0.125, eq_tol=1e9, sparse=True,
                  sparse_format=fmt, scaling=True)
        res_dp = harness.train(
            ExperimentConfig(num_devices=8,
                             save_dir=str(tmp_path / f"dp_{fmt}"), **kw),
            ds, verbose=False)
        res_1 = harness.train(
            ExperimentConfig(num_devices=1,
                             save_dir=str(tmp_path / f"sd_{fmt}"), **kw),
            ds, verbose=False)
        l_dp = [h["train_loss"] for h in res_dp.history]
        l_1 = [h["train_loss"] for h in res_1.history]
        np.testing.assert_allclose(l_dp, l_1, rtol=1e-4,
                                   err_msg=f"sparse_format={fmt}")


def test_sparse_cache_matches_streaming(tmp_path):
    """The once-converted device-resident sparse cache (preload != 'never')
    must train identically to the round-4 per-epoch reconversion route
    (preload='never')."""
    from iadmm_tpu.config import ExperimentConfig
    from iadmm_tpu.problems import generators

    ds = generators.generate("Sparse_QP", num_var=32, num_ineq=16,
                             data_size=16, seed=3, bandwidth=4)
    kw = dict(prob_type="Sparse_QP", num_var=32, num_ineq=16, data_size=16,
              hidden_dim=8, outer_T=4, truncated_length=2, batch_size=2,
              lr=1e-3, num_epoch=2, val_frac=0.125, test_frac=0.125,
              eq_tol=1e9, sparse=True, sparse_format="bsr",
              num_devices=1, scaling=True)
    res_c = harness.train(
        ExperimentConfig(preload="auto", save_dir=str(tmp_path / "c"), **kw),
        ds, verbose=False)
    res_s = harness.train(
        ExperimentConfig(preload="never", save_dir=str(tmp_path / "s"), **kw),
        ds, verbose=False)
    l_c = [h["train_loss"] for h in res_c.history]
    l_s = [h["train_loss"] for h in res_s.history]
    np.testing.assert_allclose(l_c, l_s, rtol=1e-5)
