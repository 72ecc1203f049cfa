"""Round benchmark: learned inexact-ADMM iteration throughput per chip.

Measures instance-iterations/s of the TPU-first fused step (Ã never
materialized; fused gate matmuls) on the flagship QP_1000_500_500 / h=800
workload (reference: scripts/Synthetic.sh:3-5), and compares against a
faithful same-hardware port of the reference algorithm (dense (n+m)² KKT
matrix rebuilt every step + 8 separate gate matmuls,
reference: models/lstm.py:67-96) as the baseline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "instance_iters/s", "vs_baseline": N}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_data(B: int, n: int, mi: int, me: int, seed: int = 0):
    """Flagship-shaped QP batch; a few true instances tiled to B (content
    does not affect throughput, generation cost stays low)."""
    from iadmm_tpu.problems.generators import generate
    from iadmm_tpu.problems.io import to_qp_batch
    base = 2
    ds = generate("QP", num_var=n, num_ineq=mi, num_eq=me, data_size=base,
                  seed=seed)
    reps = (B + base - 1) // base
    import dataclasses
    for f in dataclasses.fields(ds):
        v = getattr(ds, f.name)
        if isinstance(v, np.ndarray):
            setattr(ds, f.name, np.tile(v, (reps,) + (1,) * (v.ndim - 1))[:B])
    return to_qp_batch(ds)


# --------------------------------------------------------------------------
# Reference-style baseline step: materialize the (n+m)^2 KKT matrix every
# iteration and run 8 separate per-gate matmuls (models/lstm.py:60-96).
# --------------------------------------------------------------------------

def reference_style_step(params, t, state, data, sigma):
    from iadmm_tpu.solvers.step import RHO_EQ_OVER_RHO_INEQ, admm_update
    B, n = data.p.shape
    m = data.num_constr
    rho = jax.nn.sigmoid(params["rho"][t])
    rho_vec = rho * jnp.where(data.eq_mask, RHO_EQ_OVER_RHO_INEQ, 1.0)
    alpha = 2.0 * jax.nn.sigmoid(params["alpha"][t])

    eye_n = jnp.eye(n, dtype=data.Q.dtype)
    top = jnp.concatenate([data.Q + sigma * eye_n,
                           jnp.swapaxes(data.A0, -1, -2)], axis=-1)
    neg = -jnp.eye(m, dtype=data.Q.dtype) / rho_vec[:, :, None]
    At = jnp.concatenate([top, jnp.concatenate([data.A0, neg], -1)], axis=-2)
    bt = jnp.concatenate([sigma * state.x - data.p,
                          state.z - state.y / rho_vec], axis=-1)
    r = jnp.einsum("bij,bj->bi", At, state.xv) - bt
    g = jnp.einsum("bji,bj->bi", At, r)
    inputs = jnp.stack([state.xv, g], axis=-1)

    h = params["W_h"].shape[0]
    H, C = state.H, state.C
    gates = []
    for gi in range(4):  # separate per-gate matmuls like the reference
        W = params["W"][:, gi * h:(gi + 1) * h]
        U = params["U"][:, gi * h:(gi + 1) * h]
        b = params["b"][gi * h:(gi + 1) * h]
        gates.append(jnp.einsum("bsi,ik->bsk", inputs, W)
                     + jnp.einsum("bsh,hk->bsk", H, U) + b)
    i_t = jax.nn.sigmoid(gates[0])
    f_t = jax.nn.sigmoid(gates[1])
    o_t = jax.nn.sigmoid(gates[2])
    u_t = jnp.tanh(gates[3])
    C = i_t * u_t + f_t * C
    H = o_t * jnp.tanh(C)
    delta = (jnp.einsum("bsh,ho->bso", H, params["W_h"]) + params["b_h"])[..., 0]
    xv = state.xv - delta
    x, y, z = admm_update(data, xv, state.x, state.y, state.z, rho_vec,
                          alpha, relax_z=False)
    from iadmm_tpu.types import IterState
    return IterState(x=x, y=y, z=z, xv=xv, H=H, C=C)


def bench_rollout(step_fn, params, data, hidden, K, reps, label,
                  hc_dtype=None):
    from iadmm_tpu.types import init_state

    # NOTE: the timed quantity is a scalar reduction of the final state and
    # timing uses a host fetch — on the axon-tunnelled TPU backend both
    # dispatch AND block_until_ready return before execution finishes, so a
    # device->host transfer is the only reliable completion barrier.
    @jax.jit
    def roll(params, state, data):
        def body(st, t):
            return step_fn(params, t, st, data, jnp.float32(6e-6)), None
        final, _ = jax.lax.scan(body, state, jnp.arange(K))
        return final.x.sum()

    B = data.p.shape[0]
    state = init_state(B, data.num_var, data.num_constr, hidden,
                       hc_dtype=hc_dtype)
    t0 = time.perf_counter()
    s = float(roll(params, state, data))
    log(f"{label}: compile+first run {time.perf_counter() - t0:.1f}s "
        f"(sum={s:.3e})")
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(roll(params, state, data))
        times.append(time.perf_counter() - t0)
    best = min(times)
    ips = B * K / best
    log(f"{label}: best {best * 1e3:.1f} ms for {K} iters x {B} inst "
        f"-> {ips:.1f} instance_iters/s")
    return ips


def bench_megakernel(params, data, h, K, reps, timeout_s=900.0):
    """Whole-rollout megakernel throughput; None if unavailable or the
    (one-time) Mosaic compile exceeds the budget on this backend."""
    import threading
    from iadmm_tpu.kernels.rollout_kernel import fused_rollout

    box = {}

    def first_call():
        try:
            x, _, _ = fused_rollout(params, data, hidden=h, K=K, sigma=6e-6)
            box["sum"] = float(np.asarray(x).sum())
        except Exception as e:  # pragma: no cover
            box["err"] = str(e)

    t0 = time.perf_counter()
    th = threading.Thread(target=first_call, daemon=True)
    th.start()
    th.join(timeout_s)
    if th.is_alive():
        log(f"megakernel: compile exceeded {timeout_s:.0f}s budget; skipping")
        return None
    if "err" in box:
        log(f"megakernel unavailable: {box['err'][:200]}")
        return None
    log(f"megakernel: compile+first run {time.perf_counter() - t0:.1f}s "
        f"(sum={box['sum']:.3e})")
    B = data.p.shape[0]
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        x, _, _ = fused_rollout(params, data, hidden=h, K=K, sigma=6e-6)
        float(np.asarray(x).sum())
        times.append(time.perf_counter() - t0)
    best = min(times)
    ips = B * K / best
    log(f"megakernel: best {best * 1e3:.1f} ms -> {ips:.1f} instance_iters/s")
    return ips


def main():
    B, n, mi, me, h, K = 8, 1000, 500, 500, 800, 100
    log(f"devices: {jax.devices()}")
    data = make_data(B, n, mi, me)

    from iadmm_tpu.solvers.cells import lstm_init
    from iadmm_tpu.solvers import best_lstm_step
    params = lstm_init(jax.random.PRNGKey(0), input_dim=2, hidden_dim=h,
                       length=K)
    step_fn, impl = best_lstm_step()
    log(f"fused impl: {impl}")

    fused = bench_rollout(step_fn, params, data, h, K, reps=4,
                          label=f"fused[{impl}]",
                          hc_dtype=jnp.bfloat16 if "pallas" in impl else None)
    if "pallas" in impl:
        mega = bench_megakernel(params, data, h, K, reps=4)
        if mega is not None and mega > fused:
            fused, impl = mega, "pallas-megakernel"
    base = bench_rollout(reference_style_step, params, data, h, K, reps=2,
                         label="reference-style")

    print(json.dumps({
        "metric": "learned_admm_step_throughput_qp1000_500_500_h800",
        "value": round(fused, 1),
        "unit": "instance_iters/s",
        "vs_baseline": round(fused / base, 3),
        "impl": impl,
    }))


if __name__ == "__main__":
    main()
