"""Ruiz scaling: cross-check against a NumPy transliteration of the
reference's torch implementation (methods/scaling.py:50-119) and structural
invariants."""

import numpy as np
import jax.numpy as jnp

from iadmm_tpu.problems import io
from iadmm_tpu.scaling import ruiz_scale, MIN_SCALING, MAX_SCALING


def _limit(v):
    out = np.clip(v, MIN_SCALING, MAX_SCALING)
    out[out == MIN_SCALING] = 1.0
    return out


def reference_scale_numpy(Q, p, A0, zl, zu, iters):
    """Direct NumPy port of reference methods/scaling.py semantics
    (diagonal matrices reduced to vectors; identical arithmetic)."""
    B, n = p.shape
    m = A0.shape[1]
    D = np.ones((B, n))
    E = np.ones((B, m))
    c = np.ones((B,))
    Q, p, A0, zl, zu = (x.copy() for x in (Q, p, A0, zl, zu))
    for _ in range(iters):
        norm_q = np.abs(Q).max(axis=1)           # col norms (dim=1)
        norm_a_cols = np.abs(A0).max(axis=1)
        first = np.maximum(norm_q, norm_a_cols)
        second = np.abs(A0).max(axis=2)
        norms = _limit(np.concatenate([first, second], axis=-1))
        s = 1.0 / np.sqrt(norms)
        dt, et = s[:, :n], s[:, n:]
        Q = dt[:, :, None] * Q * dt[:, None, :]
        A0 = et[:, :, None] * A0 * dt[:, None, :]
        p = dt * p
        zl = et * zl
        zu = et * zu
        D *= dt
        E *= et
        norm_q_mean = np.abs(Q).max(axis=1).mean(axis=-1)
        inf_p = _limit(np.abs(p).max(axis=-1))
        sc = _limit(np.maximum(inf_p, norm_q_mean))
        ct = 1.0 / sc
        Q = ct[:, None, None] * Q
        p = ct[:, None] * p
        c = ct * c
    return Q, p, A0, zl, zu, D, E, c


def test_matches_reference_numpy(tiny_qp):
    batch = io.to_qp_batch(tiny_qp, dtype=jnp.float64)
    Qs, ps, As, zls, zus, st = ruiz_scale(batch.Q, batch.p, batch.A0,
                                          batch.zl, batch.zu, iters=10)
    rQ, rp, rA, rzl, rzu, rD, rE, rc = reference_scale_numpy(
        np.asarray(batch.Q), np.asarray(batch.p), np.asarray(batch.A0),
        np.asarray(batch.zl), np.asarray(batch.zu), 10)
    assert np.allclose(np.asarray(Qs), rQ, rtol=1e-10, atol=1e-12)
    assert np.allclose(np.asarray(ps), rp, rtol=1e-10, atol=1e-12)
    assert np.allclose(np.asarray(As), rA, rtol=1e-10, atol=1e-12)
    finite = np.isfinite(rzl)
    assert np.allclose(np.asarray(zls)[finite], rzl[finite], rtol=1e-10)
    assert np.allclose(np.asarray(st.d), rD, rtol=1e-10)
    assert np.allclose(np.asarray(st.e), rE, rtol=1e-10)
    assert np.allclose(np.asarray(st.cost), rc, rtol=1e-10)


def test_equilibration_improves_conditioning(tiny_qp):
    batch = io.to_qp_batch(tiny_qp, dtype=jnp.float64)
    Qs, ps, As, _, _, st = ruiz_scale(batch.Q, batch.p, batch.A0,
                                      batch.zl, batch.zu, iters=10)
    # After Ruiz, KKT column norms should be near 1.
    norm_q = jnp.abs(Qs).max(axis=1)
    norm_a_col = jnp.abs(As).max(axis=1)
    norm_a_row = jnp.abs(As).max(axis=2)
    first = jnp.maximum(norm_q, norm_a_col)
    assert float(jnp.abs(jnp.log(first)).max()) < 0.7
    assert float(jnp.abs(jnp.log(norm_a_row)).max()) < 0.7
    # unscale identity: D * (scaled problem solution map) — check data maps
    # A0_orig = (1/e) * A0_scaled * (1/d)
    recon = np.asarray(As) / np.asarray(st.e)[:, :, None] \
        / np.asarray(st.d)[:, None, :]
    assert np.allclose(recon, np.asarray(batch.A0), rtol=1e-8)
    # Q_orig = (1/cost) * (1/d) Qs (1/d)
    reconQ = np.asarray(Qs) / np.asarray(st.cost)[:, None, None] \
        / np.asarray(st.d)[:, :, None] / np.asarray(st.d)[:, None, :]
    assert np.allclose(reconQ, np.asarray(batch.Q), rtol=1e-8)


def test_scaling_factors_bounded(tiny_qp):
    batch = io.to_qp_batch(tiny_qp, dtype=jnp.float64)
    _, _, _, _, _, st = ruiz_scale(batch.Q, batch.p, batch.A0,
                                   batch.zl, batch.zu, iters=10)
    assert np.all(np.asarray(st.d) > 0)
    assert np.all(np.asarray(st.e) > 0)
    assert np.all(np.asarray(st.cost) > 0)
