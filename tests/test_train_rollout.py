"""Training megakernel (kernels/train_rollout.py) numerics.

Validates the hand-derived in-kernel backward against ``jax.grad`` of a
pure-jnp replica that mirrors the kernel's exact numerics (bf16 matvec
operands with f32 accumulation, f32-elementwise input-gate products against
the bf16-rounded W, exp-form sigmoid/tanh).  Runs the Pallas kernels in
interpret mode on CPU.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iadmm_tpu.solvers import cells
from iadmm_tpu.solvers.step import RHO_EQ_OVER_RHO_INEQ
from iadmm_tpu.types import QPBatch, IterState, init_state
from iadmm_tpu.kernels.train_rollout import make_fused_chunk_loss

F = jnp.float32
BF = jnp.bfloat16


def _sig(v):
    return 1.0 / (1.0 + jnp.exp(-v))


def _tanh(v):
    return 2.0 / (1.0 + jnp.exp(-2.0 * v)) - 1.0


def make_problem(key, B=2, n=8, m=8, h=16):
    ks = jax.random.split(key, 8)
    M = jax.random.normal(ks[0], (B, n, n), F)
    Q = jnp.einsum("bij,bkj->bik", M, M) / n + jnp.eye(n, dtype=F)
    A0 = jax.random.normal(ks[1], (B, m, n), F) / np.sqrt(n)
    p = jax.random.normal(ks[2], (B, n), F)
    zl = -jnp.abs(jax.random.normal(ks[3], (B, m), F)) - 0.5
    zu = jnp.abs(jax.random.normal(ks[4], (B, m), F)) + 0.5
    eq = jnp.arange(m) < m // 2
    eq_mask = jnp.broadcast_to(eq, (B, m))
    b_eq = jax.random.normal(ks[5], (B, m), F) * 0.3
    zl = jnp.where(eq_mask, b_eq, zl)
    zu = jnp.where(eq_mask, b_eq, zu)
    data = QPBatch(Q=Q, p=p, A0=A0, zl=zl, zu=zu, eq_mask=eq_mask)
    params = cells.lstm_init(ks[6], 2, h, 8)
    st = init_state(B, n, m, h)
    # non-trivial starting state (chunk 2+ of a TBPTT rollout)
    st = IterState(
        x=0.1 * jax.random.normal(ks[7], (B, n), F),
        y=0.1 * jax.random.normal(jax.random.fold_in(key, 9), (B, m), F),
        z=0.1 * jax.random.normal(jax.random.fold_in(key, 10), (B, m), F),
        xv=0.1 * jax.random.normal(jax.random.fold_in(key, 11),
                                   (B, n + m), F),
        H=0.1 * jax.random.normal(jax.random.fold_in(key, 12),
                                  (B, n + m, h), F),
        C=0.1 * jax.random.normal(jax.random.fold_in(key, 13),
                                  (B, n + m, h), F))
    return data, params, st


def replica_chunk_loss(params, st: IterState, data: QPBatch, sigma,
                       chunk_len, outer_T, t0, cdt=BF):
    """jnp mirror of the kernel numerics (see module docstring)."""
    n = data.num_var
    W = params["W"].astype(cdt).astype(F)
    b = params["b"].reshape(1, -1).astype(F)
    bh = params["b_h"].reshape(1, -1).astype(F)

    def mv(M, v):  # (B,i,j),(B,j)->(B,i) cdt operands, f32 acc
        return jnp.einsum("bij,bj->bi", M.astype(cdt), v.astype(cdt),
                          preferred_element_type=F)

    def mvt(M, v):
        return jnp.einsum("bij,bi->bj", M.astype(cdt), v.astype(cdt),
                          preferred_element_type=F)

    def gmm(Xf32, Mw):  # (B,s,h)x(h,k) gate matmul in cdt, f32 acc
        return jnp.einsum("bsh,hk->bsk", Xf32.astype(cdt),
                          Mw.astype(cdt), preferred_element_type=F)

    def body(carry, t):
        x, y, z, xv, H, C = carry
        rho_t = _sig(params["rho"][t])
        alpha_t = 2.0 * _sig(params["alpha"][t])
        rho_row = rho_t * jnp.where(data.eq_mask, RHO_EQ_OVER_RHO_INEQ, 1.0)
        u, nu = xv[:, :n], xv[:, n:]
        b1 = sigma * x - data.p
        r1 = mv(data.Q, u) + sigma * u + mvt(data.A0, nu) - b1
        r2 = mv(data.A0, u) - (nu - y) / rho_row - z
        g1 = mv(data.Q, r1) + sigma * r1 + mvt(data.A0, r2)
        g2 = mv(data.A0, r1) - r2 / rho_row
        g = jnp.concatenate([g1, g2], -1)
        gates = (xv[..., None] * W[0] + g[..., None] * W[1]
                 + gmm(H, params["U"]) + b)
        h = H.shape[-1]
        i_t = _sig(gates[..., 0 * h:1 * h])
        f_t = _sig(gates[..., 1 * h:2 * h])
        o_t = _sig(gates[..., 2 * h:3 * h])
        u_t = _tanh(gates[..., 3 * h:4 * h])
        C_new = i_t * u_t + f_t * C
        H_new = o_t * _tanh(C_new)
        delta = gmm(H_new, params["W_h"])[..., 0] + bh
        xv_new = xv - delta
        x_t, v = xv_new[:, :n], xv_new[:, n:]
        z_t = z + (v - y) / rho_row
        x_new = alpha_t * x_t + (1.0 - alpha_t) * x
        z_new = jnp.minimum(jnp.maximum(z_t + y / rho_row, data.zl), data.zu)
        y_new = y + rho_row * (z_t - z_new)
        v1 = mv(data.A0, x_new) - z_new
        v2 = mv(data.Q, x_new) + data.p + mvt(data.A0, y_new)
        pr = jnp.sqrt(jnp.sum(v1 * v1, -1))
        dr = jnp.sqrt(jnp.sum(v2 * v2, -1))
        return (x_new, y_new, z_new, xv_new, H_new, C_new), (pr + dr).mean()

    carry = (st.x, st.y, st.z, st.xv, st.H, st.C)
    carry, losses = jax.lax.scan(body, carry, t0 + jnp.arange(chunk_len))
    x, y, z, xv, H, C = carry
    return losses.sum() / outer_T, IterState(x=x, y=y, z=z, xv=xv, H=H, C=C)


@pytest.mark.parametrize("t0_val,seg,dtype,stream",
                         [(0, 2, "float32", False),
                          (4, 4, "float32", False),
                          (0, 2, "bfloat16", False),
                          (0, 0, "float32", True),
                          (4, 0, "float32", True),
                          (0, 0, "bfloat16", True)])
def test_fused_chunk_grads_match_replica(t0_val, seg, dtype, stream):
    B, n, m, h = 2, 8, 8, 16
    chunk_len, outer_T, K_total, sigma = 4, 8, 8, 1e-3
    data, params, st = make_problem(jax.random.PRNGKey(0), B, n, m, h)
    params = jax.tree.map(lambda a: a.astype(F), params)
    cdt = BF if dtype == "bfloat16" else F

    fused = make_fused_chunk_loss(
        num_var=n, num_constr=m, batch=B, hidden=h, sigma=sigma,
        chunk_len=chunk_len, outer_T=outer_T, K_total=K_total,
        interpret=True, seg=min(seg, chunk_len), compute_dtype=dtype,
        stream=stream)
    assert fused.stream == stream

    t0 = jnp.asarray(t0_val, jnp.int32)
    (lf, stf), gf = jax.value_and_grad(
        lambda p: fused(p, st, data, t0), has_aux=True)(params)
    (lr, str_), gr = jax.value_and_grad(
        lambda p: replica_chunk_loss(p, st, data, sigma, chunk_len,
                                     outer_T, t0, cdt), has_aux=True)(params)

    assert np.isfinite(float(lf))
    np.testing.assert_allclose(float(lf), float(lr), rtol=1e-5)
    # final state round-trips through padding
    for name in ("x", "y", "z", "xv", "H", "C"):
        np.testing.assert_allclose(
            np.asarray(getattr(stf, name)), np.asarray(getattr(str_, name)),
            rtol=2e-4, atol=2e-5, err_msg=f"state.{name}")
    # In f32 mode the kernel backward and replica autodiff run the same ops
    # (tight match proves the hand-derived VJP).  In bf16 mode the kernel
    # additionally rounds backward cotangents (dpre/ddelta) to bf16 before
    # the MXU grad matmuls, which replica autodiff keeps in f32 — compare
    # loosely, normalized per-leaf.
    atol = 5e-5 if dtype == "float32" else 2e-2
    for k in gf:
        a, b = np.asarray(gf[k]), np.asarray(gr[k])
        denom = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(a / denom, b / denom, rtol=0, atol=atol,
                                   err_msg=f"grad[{k}]")


def test_rho_alpha_grads_land_at_t0():
    """Schedule grads must land at [t0, t0+chunk) in the K_total vector."""
    B, n, m, h = 2, 8, 8, 16
    chunk_len, outer_T, K_total, sigma = 2, 8, 8, 1e-3
    data, params, st = make_problem(jax.random.PRNGKey(1), B, n, m, h)
    fused = make_fused_chunk_loss(
        num_var=n, num_constr=m, batch=B, hidden=h, sigma=sigma,
        chunk_len=chunk_len, outer_T=outer_T, K_total=K_total,
        interpret=True, seg=2)
    t0 = jnp.asarray(4, jnp.int32)
    _, g = jax.value_and_grad(lambda p: fused(p, st, data, t0)[0])(params)
    rho_g = np.asarray(g["rho"])
    assert rho_g.shape == (K_total,)
    assert np.all(rho_g[:4] == 0) and np.all(rho_g[6:] == 0)
    assert np.any(rho_g[4:6] != 0)


def test_harness_fused_backend_trains(tmp_path):
    """End-to-end: harness.train with train_backend='fused' (interpret mode
    on CPU) runs, losses are finite and decrease vs epoch 0."""
    from iadmm_tpu.problems import generate
    from iadmm_tpu.train import harness
    import iadmm_tpu as it

    ds = generate("QP", num_var=12, num_ineq=6, num_eq=6, data_size=8,
                  seed=3)
    cfg = it.ExperimentConfig(
        prob_type="QP", num_var=12, num_ineq=6, num_eq=6, data_size=8,
        hidden_dim=8, outer_T=6, truncated_length=3, batch_size=2,
        lr=5e-3, num_epoch=3, val_frac=0.25, test_frac=0.0, eq_tol=1e9,
        num_devices=1, scaling=False, preload="never",
        train_backend="fused", matvec_mode="bf16", save_dir=str(tmp_path))
    res = harness.train(cfg, ds, verbose=False)
    losses = [h["train_loss"] for h in res.history]
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]


def test_fused_dp_matches_single_device():
    """shard_map-wrapped fused loss on the 8-device CPU mesh == single-dev."""
    from iadmm_tpu import dist

    B, n, m, h = 4, 8, 8, 16
    chunk_len, outer_T, K_total, sigma = 2, 4, 4, 1e-3
    data, params, st = make_problem(jax.random.PRNGKey(2), B, n, m, h)
    kw = dict(num_var=n, num_constr=m, hidden=h, sigma=sigma,
              chunk_len=chunk_len, outer_T=outer_T, K_total=K_total,
              interpret=True, seg=2)
    single = make_fused_chunk_loss(batch=B, **kw)
    mesh = dist.make_mesh(2)
    dp = make_fused_chunk_loss(batch=B // 2, mesh=mesh, **kw)

    t0 = jnp.asarray(0, jnp.int32)
    (l1, st1), g1 = jax.value_and_grad(
        lambda p: single(p, st, data, t0), has_aux=True)(params)
    (l2, st2), g2 = jax.value_and_grad(
        lambda p: dp(p, st, data, t0), has_aux=True)(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for k in g1:
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g2[k]),
                                   rtol=1e-5, atol=1e-7, err_msg=k)
    np.testing.assert_allclose(np.asarray(st1.x), np.asarray(st2.x),
                               rtol=1e-6)


def test_stream_auto_selection(monkeypatch):
    """stream=None auto-picks: on when the chunk checkpoint stack fits the
    HBM budget, off (recompute segments) when it does not."""
    kw = dict(num_var=8, num_constr=8, batch=2, hidden=16, sigma=1e-3,
              chunk_len=4, outer_T=8, K_total=8, interpret=True)
    on = make_fused_chunk_loss(**kw)
    assert on.stream and on.segment_len == 4
    monkeypatch.setenv("IADMM_STREAM_HBM", "1")  # 1 byte: nothing fits
    off = make_fused_chunk_loss(**kw)
    assert not off.stream
