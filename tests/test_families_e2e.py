"""Per-family end-to-end smoke: train a few epochs + eval traces.

Pins that every problem family flows through scaling, TBPTT training,
eval rollout (family-specific violation keys), and Stage II.
"""

import numpy as np
import pytest

from iadmm_tpu.config import ExperimentConfig
from iadmm_tpu.problems import generators
from iadmm_tpu.train import harness
from iadmm_tpu.evaluation.driver import run_test


CASES = [
    # (family, gen kwargs, cfg extras, expected violation keys)
    ("SVM", dict(num_var=8, num_ineq=6), dict(num_ineq=6),
     {"ineq_max", "lb_max", "ub_max"}),
    ("Equality_QP", dict(num_var=10, num_eq=5), dict(num_eq=5),
     {"eq_max"}),
    ("Portfolio", dict(num_var=10, num_ineq=3), dict(num_ineq=3),
     {"eq_max", "lb_max", "ub_max"}),
]


@pytest.mark.parametrize("fam,gkw,ckw,vio_keys", CASES)
def test_family_train_and_eval(tmp_path, fam, gkw, ckw, vio_keys):
    ds = generators.generate(fam, data_size=16, seed=5, **gkw)
    cfg = ExperimentConfig(
        prob_type=fam, num_var=gkw["num_var"], data_size=16,
        hidden_dim=8, outer_T=4, truncated_length=2, test_outer_T=4,
        batch_size=4, test_batch_size=4, lr=1e-3, num_epoch=2,
        val_frac=0.25, test_frac=0.25, eq_tol=1e9, remat=True,
        feas_rest=True, feas_rest_num=2, save_dir=str(tmp_path), **ckw)
    res = harness.train(cfg, ds, verbose=False)
    assert np.isfinite(res.history[-1]["train_loss"])
    rep = run_test(cfg, ds, res.params, verbose=False)
    assert vio_keys.issubset(rep.violations.keys()), rep.violations.keys()
    assert np.isfinite(rep.primal_res).all()
    assert rep.stage2 is not None
    assert np.isfinite(rep.stage2.primal_res).all()


def test_clip_grad_norm_caps_spike_steps():
    """clip_grad_norm>0 must bound the update where plain Adam would take a
    full-size step from a spiked gradient, and leave small-grad steps
    identical (QP_RHS epoch-174 blow-up mitigation, harness.make_optimizer)."""
    import jax.numpy as jnp
    params = {"W": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    spiked = {"W": jnp.full((4, 4), 1e6), "b": jnp.full((4,), -1e6)}
    small = {"W": jnp.full((4, 4), 1e-8), "b": jnp.full((4,), 1e-8)}

    plain = harness.make_optimizer(1e-3)
    clipped = harness.make_optimizer(1e-3, clip_grad_norm=1.0)

    # spiked grads: the clipped first-step update must stay finite and the
    # clipped transform must actually rescale the incoming gradient
    up_c, _ = clipped.update(spiked, clipped.init(params), params)
    gnorm = float(jnp.sqrt(sum((jnp.asarray(v) ** 2).sum()
                               for v in up_c.values())))
    assert np.isfinite(gnorm)

    # small grads (global norm << 1): clipping is a no-op — identical updates
    s1, _ = plain.update(small, plain.init(params), params)
    s2, _ = clipped.update(small, clipped.init(params), params)
    for k in s1:
        assert np.allclose(np.asarray(s1[k]), np.asarray(s2[k]), rtol=0,
                           atol=0), k
