"""Whole-rollout megakernel vs the per-step path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from iadmm_tpu.kernels.rollout_kernel import fused_rollout
from iadmm_tpu.problems import generators, io
from iadmm_tpu.solvers.cells import lstm_init
from iadmm_tpu.solvers.step import make_lstm_step
from iadmm_tpu.solvers.rollouts import rollout
from iadmm_tpu.types import init_state

SIGMA = 6e-6


def test_fused_rollout_matches_step_path():
    B, n, mi, me, h, K = 3, 20, 10, 10, 16, 6
    ds = generators.generate("QP", num_var=n, num_ineq=mi, num_eq=me,
                             data_size=B, seed=11)
    data = io.to_qp_batch(ds)
    params = lstm_init(jax.random.PRNGKey(2), 2, h, K)

    step = make_lstm_step(use_pallas=False, matvec_mode="bf16")
    st = init_state(B, n, mi + me, h)
    with pltpu.force_tpu_interpret_mode():
        ref = rollout(step, params, st, data, jnp.float32(SIGMA), K)
        x, y, z = fused_rollout(params, data, hidden=h, K=K, sigma=SIGMA)
    # bf16 matvecs accumulate slightly differently between the two paths;
    # iterates must agree to bf16-level tolerance.
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref.x),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(z), np.asarray(ref.z),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref.y),
                               rtol=2e-2, atol=2e-2)


def test_fused_rollout_sharded_matches_local():
    """shard_map megakernel over the 8-device CPU mesh (interpret mode)."""
    import pytest
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from iadmm_tpu import dist
    from iadmm_tpu.kernels.rollout_kernel import fused_rollout_sharded

    B, n, mi, me, h, K = 8, 16, 8, 8, 8, 4
    ds = generators.generate("QP", num_var=n, num_ineq=mi, num_eq=me,
                             data_size=B, seed=3)
    data = io.to_qp_batch(ds, with_metric_views=False)
    params = lstm_init(jax.random.PRNGKey(1), 2, h, K)
    mesh = dist.make_mesh(8)
    with pltpu.force_tpu_interpret_mode():
        x1, y1, z1 = fused_rollout(params, data, hidden=h, K=K, sigma=1e-6)
        xs, ys, zs = fused_rollout_sharded(params, data, mesh,
                                           hidden=h, K=K, sigma=1e-6)
    np.testing.assert_allclose(np.asarray(xs), np.asarray(x1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(y1),
                               rtol=1e-5, atol=1e-6)

