"""Fused Stage-II CG polish kernel vs the XLA matrix-free path."""

import jax
import jax.numpy as jnp
import numpy as np

from iadmm_tpu.problems.generators import generate
from iadmm_tpu.problems.io import to_qp_batch
from iadmm_tpu.solvers.step import rho_vector
from iadmm_tpu.solvers.cg import feasibility_restoration_cg
from iadmm_tpu.kernels.stage2_kernel import fused_stage2
from iadmm_tpu.types import init_state, IterState


def _setup(B=3, n=12, mi=8, me=6):
    ds = generate("QP", num_var=n, num_ineq=mi, num_eq=me, data_size=B,
                  seed=11)
    data = to_qp_batch(ds, with_metric_views=False)
    rng = np.random.default_rng(0)
    st = init_state(B, n, mi + me, 4)
    st = IterState(
        x=jnp.asarray(rng.standard_normal((B, n)) * 0.1, jnp.float32),
        y=jnp.asarray(rng.standard_normal((B, mi + me)) * 0.1, jnp.float32),
        z=jnp.asarray(rng.standard_normal((B, mi + me)) * 0.1, jnp.float32),
        xv=jnp.zeros((B, n + mi + me), jnp.float32), H=st.H, C=st.C)
    rho_vec = rho_vector(jnp.float32(0.1), data.eq_mask)
    return data, st, rho_vec


def test_fused_stage2_matches_xla_cg():
    data, st, rho_vec = _setup()
    N = 12
    ref = feasibility_restoration_cg(st, data, 1e-4, rho_vec, N,
                                     cg_iters=60)
    # f32 reassociation + the CG early-exit branch at the tol boundary make
    # bitwise equality impossible; the two paths must agree behaviorally.
    out, pr, dr = fused_stage2(st, data, rho_vec, num_iters=N, cg_iters=60,
                               sigma=1e-4, interpret=True)
    for name in ("x", "y", "z"):
        np.testing.assert_allclose(np.asarray(getattr(out, name)),
                                   np.asarray(getattr(ref, name)),
                                   rtol=5e-3, atol=5e-4, err_msg=name)
    assert pr.shape == (3, N) and dr.shape == (3, N)
    # polish must monotonically crush the primal residual overall
    assert float(pr[:, -1].mean()) < float(pr[:, 0].mean())


def test_fused_stage2_converges_to_feasibility():
    data, st, rho_vec = _setup(B=2, n=16, mi=10, me=8)
    out, pr, dr = fused_stage2(st, data, rho_vec, num_iters=60,
                               cg_iters=80, sigma=1e-4, interpret=True)
    assert float(pr[:, -1].max()) < 1e-2


def test_fused_stage2_direct_matches_lu():
    """The 'direct' in-kernel solver (explicit M⁻¹ + refinement) is an
    exact solve like the LU route — the two polish trajectories must agree
    tightly, unlike the accuracy-limited Jacobi-CG fallback."""
    from iadmm_tpu.solvers.exact import feasibility_restoration

    data, st, rho_vec = _setup(B=2, n=20, mi=12, me=10)
    N = 15
    ref = feasibility_restoration(st, data, 1e-4, rho_vec, N)
    out, pr, dr = fused_stage2(st, data, rho_vec, num_iters=N,
                               sigma=1e-4, solver="direct", refine=2,
                               interpret=True)
    for name in ("x", "y", "z"):
        np.testing.assert_allclose(np.asarray(getattr(out, name)),
                                   np.asarray(getattr(ref, name)),
                                   rtol=1e-3, atol=1e-4, err_msg=name)


def test_fused_stage2_kkt_matches_lu():
    """The 'kkt' solver (explicit f32 inverse of the FULL saddle-point
    matrix, the default) solves the same linear system the LU route
    factors — trajectories must agree much tighter than the condensed
    'direct' solver, whose accuracy is limited by cond(M) ≫ cond(Ã)."""
    from iadmm_tpu.solvers.exact import feasibility_restoration

    data, st, rho_vec = _setup(B=2, n=20, mi=12, me=10)
    N = 15
    ref = feasibility_restoration(st, data, 1e-4, rho_vec, N)
    out, pr, dr = fused_stage2(st, data, rho_vec, num_iters=N,
                               sigma=1e-4, solver="kkt", interpret=True)
    # both sides are f32 exact solves of the same system; agreement is at
    # f32 accumulation level (~1e-4 rel over a 15-step trajectory), still
    # ~3-10x tighter than the condensed 'direct' solver's 1e-3 bar above
    for name in ("x", "y", "z"):
        np.testing.assert_allclose(np.asarray(getattr(out, name)),
                                   np.asarray(getattr(ref, name)),
                                   rtol=3e-4, atol=3e-5, err_msg=name)
    # one f32-KKT refinement pass must not break anything
    out_r, _, _ = fused_stage2(st, data, rho_vec, num_iters=N,
                               sigma=1e-4, solver="kkt", refine=1,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(out_r.x), np.asarray(ref.x),
                               rtol=3e-4, atol=3e-5)


def test_fused_stage2_rejects_unknown_solver():
    import pytest

    data, st, rho_vec = _setup(B=1, n=8, mi=4, me=4)
    with pytest.raises(ValueError, match="unknown stage2 solver"):
        fused_stage2(st, data, rho_vec, num_iters=2, solver="qr",
                     interpret=True)
