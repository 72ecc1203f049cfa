"""Numerical parity against the actual reference implementation.

Runs the reference's torch modules (read-only import from /root/reference,
CPU) side by side with our JAX implementation on identical data and
parameters.  Skipped when the reference checkout is not present.  This does
not copy reference code — it drives it as an oracle.
"""

import sys

import numpy as np
import pytest

REF = "/root/reference"


def _ref_available():
    import os
    return os.path.isdir(REF)


pytestmark = pytest.mark.skipif(not _ref_available(),
                                reason="reference checkout not mounted")


@pytest.fixture(scope="module")
def torch_ref():
    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import importlib
    lstm_mod = importlib.import_module("models.lstm")
    scaling_mod = importlib.import_module("methods.scaling")
    return torch, lstm_mod, scaling_mod


def _problem(B=3, n=10, mi=6, me=4, seed=0):
    from iadmm_tpu.problems.generators import generate
    from iadmm_tpu.problems.io import to_qp_batch
    ds = generate("QP", num_var=n, num_ineq=mi, num_eq=me, data_size=B,
                  seed=seed)
    return ds, to_qp_batch(ds)


def test_lstm_step_matches_reference(torch_ref):
    torch, lstm_mod, _ = torch_ref
    import jax
    import jax.numpy as jnp
    from iadmm_tpu.solvers.cells import lstm_init, to_reference_naming
    from iadmm_tpu.solvers.step import lstm_step
    from iadmm_tpu.types import init_state

    B, n, mi, me, h, T = 3, 10, 6, 4, 12, 4
    m = mi + me
    ds, data = _problem(B, n, mi, me)
    params = lstm_init(jax.random.PRNGKey(0), 2, h, T)

    # Load our params into the reference module (per-gate naming).
    ref_model = lstm_mod.LSTM(m, 2, h, T, "cpu")
    ref_named = to_reference_naming(params)
    with torch.no_grad():
        for k, v in ref_named.items():
            getattr(ref_model, k).copy_(torch.tensor(np.asarray(v)))

    def tt(a):
        return torch.tensor(np.asarray(a, np.float32)[..., None])

    kwargs = dict(Q=torch.tensor(np.asarray(data.Q)), p=tt(data.p),
                  A0=torch.tensor(np.asarray(data.A0)),
                  zl=tt(data.zl), zu=tt(data.zu), lb=None, ub=None)
    x = torch.zeros((B, n, 1))
    y = torch.zeros((B, m, 1))
    z = torch.zeros((B, m, 1))
    xv = torch.zeros((B, n + m, 1))
    H = torch.zeros((B, n + m, h))
    C = torch.zeros((B, n + m, h))

    st = init_state(B, n, m, h)
    sigma = jnp.float32(6e-6)
    for t in range(T):
        with torch.no_grad():
            x, y, z, xv, H, C, _, _, _ = ref_model(
                t, mi, me, x, y, z, xv, 6e-6, H, C, **kwargs)
        st = lstm_step(params, t, st, data, sigma)
        np.testing.assert_allclose(np.asarray(st.x),
                                   x.numpy()[..., 0], rtol=2e-4, atol=1e-5,
                                   err_msg=f"x at t={t}")
        np.testing.assert_allclose(np.asarray(st.y),
                                   y.numpy()[..., 0], rtol=2e-4, atol=1e-5,
                                   err_msg=f"y at t={t}")
        np.testing.assert_allclose(np.asarray(st.z),
                                   z.numpy()[..., 0], rtol=2e-4, atol=1e-5,
                                   err_msg=f"z at t={t}")
        np.testing.assert_allclose(np.asarray(st.H),
                                   H.numpy(), rtol=2e-4, atol=1e-5,
                                   err_msg=f"H at t={t}")


def test_ruiz_scaling_matches_reference(torch_ref):
    torch, _, scaling_mod = torch_ref
    from iadmm_tpu.scaling import ruiz_scale

    B, n, mi, me = 2, 8, 5, 3
    m = mi + me
    ds, data = _problem(B, n, mi, me, seed=4)

    sc = scaling_mod.Scaling(n, m, 10, "cpu")
    Qs, ps, A0s, zls, zus = sc.scale_data(
        torch.tensor(np.asarray(data.Q)),
        torch.tensor(np.asarray(data.p)[..., None]),
        torch.tensor(np.asarray(data.A0)),
        torch.tensor(np.asarray(data.zl)[..., None]),
        torch.tensor(np.asarray(data.zu)[..., None]))

    Q2, p2, A02, zl2, zu2, st = ruiz_scale(data.Q, data.p, data.A0,
                                           data.zl, data.zu, iters=10)
    np.testing.assert_allclose(np.asarray(Q2), Qs.numpy(), rtol=1e-4,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(p2), ps.numpy()[..., 0],
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(A02), A0s.numpy(), rtol=1e-4,
                               atol=1e-6)
    # finite bound rows only (inf stays inf on both sides)
    fin = np.isfinite(np.asarray(data.zl))
    np.testing.assert_allclose(np.asarray(zl2)[fin],
                               zls.numpy()[..., 0][fin], rtol=1e-4,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(st.d),
                               sc.D.diagonal(dim1=-2, dim2=-1).numpy(),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st.cost),
                               sc.c.numpy().reshape(-1), rtol=1e-4,
                               atol=1e-6)


def test_lu_stage2_matches_reference(torch_ref):
    torch, _, _ = torch_ref
    import importlib
    lu_mod = importlib.import_module("models.lu")
    import jax.numpy as jnp
    from iadmm_tpu.solvers import exact as exact_mod
    from iadmm_tpu.solvers.step import rho_vector
    from iadmm_tpu.types import IterState

    B, n, mi, me = 2, 8, 5, 3
    m = mi + me
    ds, data = _problem(B, n, mi, me, seed=6)
    rng = np.random.default_rng(1)
    x0 = rng.standard_normal((B, n)).astype(np.float32) * 0.1
    y0 = rng.standard_normal((B, m)).astype(np.float32) * 0.1
    z0 = rng.standard_normal((B, m)).astype(np.float32) * 0.1
    rho_vec = np.asarray(rho_vector(jnp.float32(0.3), data.eq_mask))

    ref_model = lu_mod.LU("cpu")
    def tt(a):
        return torch.tensor(a[..., None])
    x, y, z = tt(x0), tt(y0), tt(z0)
    xv = torch.zeros((B, n + m, 1))
    kwargs = dict(Q=torch.tensor(np.asarray(data.Q)),
                  p=tt(np.asarray(data.p)),
                  A0=torch.tensor(np.asarray(data.A0)),
                  zl=tt(np.asarray(data.zl)), zu=tt(np.asarray(data.zu)),
                  lb=None, ub=None)
    A_tild = lu = piv = None
    st = IterState(x=jnp.asarray(x0), y=jnp.asarray(y0), z=jnp.asarray(z0),
                   xv=jnp.zeros((B, n + m)), H=jnp.zeros((B, n + m, 4)),
                   C=jnp.zeros((B, n + m, 4)))
    sigma = jnp.float32(6e-6)
    lu_j, piv_j = exact_mod.lu_factorize(data, sigma, jnp.asarray(rho_vec))
    for t in range(3):
        with torch.no_grad():
            x, y, z, xv, A_tild, b_tild, lu, piv = ref_model(
                torch.tensor(rho_vec[..., None]), x, y, z, xv, 6e-6,
                A_tild, lu, piv, **kwargs)
        st = exact_mod.exact_step(lu_j, piv_j, jnp.asarray(rho_vec), st,
                                  data, sigma)
        np.testing.assert_allclose(np.asarray(st.x), x.numpy()[..., 0],
                                   rtol=2e-4, atol=1e-5, err_msg=f"t={t}")
        np.testing.assert_allclose(np.asarray(st.z), z.numpy()[..., 0],
                                   rtol=2e-4, atol=1e-5, err_msg=f"t={t}")
