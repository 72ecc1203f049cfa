"""On-chip training-step benchmark: TBPTT chunk (fwd+bwd+Adam) at the
flagship QP_1000_500_500 / h=800 shape, step backend vs the fused
training megakernel (kernels/train_rollout.py).

Round-1 reference point: 1.42 ms/ADMM-iter @ B=2 on the step backend
(BASELINE.md).  Appends a JSON summary to artifacts/train_bench.json.

Usage: python scripts/bench_train.py [--reps 5] [--skip_step]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_chunk(train_chunk, params, opt_state, state, data, reps, label):
    """Times repeated chunk updates; host fetch of the loss is the only
    reliable completion barrier on the tunnelled backend (CLAUDE.md)."""
    t0 = time.perf_counter()
    params, opt_state, state, loss = train_chunk(
        params, opt_state, state, data, jnp.int32(0))
    l0 = float(loss)
    log(f"{label}: compile+first {time.perf_counter() - t0:.1f}s "
        f"(loss={l0:.4e})")
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        params, opt_state, state, loss = train_chunk(
            params, opt_state, state, data, jnp.int32(0))
        float(loss)
        times.append(time.perf_counter() - t0)
    return min(times), l0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--skip_step", action="store_true")
    ap.add_argument("--skip_fused", action="store_true")
    ap.add_argument("--chunk", type=int, default=100)
    ap.add_argument("--batch", type=int, default=2,
                    help="instance batch; 2 = the reference's latency-bound "
                         "protocol (main.py:55), 8/16 = throughput mode")
    ap.add_argument("--variant", default="both",
                    choices=["both", "stream", "recompute"],
                    help="which fused kernel variant(s) to time")
    ap.add_argument("--remat", action="store_true",
                    help="jax.checkpoint each step in the backward (needed "
                         "at B=16: full activation storage is 17 GB > HBM)")
    args = ap.parse_args()

    B, n, mi, me, h = args.batch, 1000, 500, 500, 800
    K = args.chunk
    log(f"backend: {jax.default_backend()}  devices: {jax.devices()}")

    from bench import make_data
    from iadmm_tpu.solvers.cells import lstm_init
    from iadmm_tpu.solvers import best_lstm_step
    from iadmm_tpu.train.harness import make_train_chunk, make_optimizer
    from iadmm_tpu.types import init_state

    data = make_data(B, n, mi, me)
    params = lstm_init(jax.random.PRNGKey(0), input_dim=2, hidden_dim=h,
                       length=K)
    optimizer = make_optimizer(5e-5, 0.0)
    opt_state = optimizer.init(params)
    out = {"shape": dict(B=B, n=n, mi=mi, me=me, h=h, chunk=K,
                         remat=args.remat)}

    # Model FLOPs per training iteration (fwd + standard 2x for bwd):
    # gate GEMMs over B*(n+m) tokens (in 2->4h, recurrent h->4h, head h->1)
    # + the KKT-feature matvecs (Qx, two A0 contractions, ~4*(n+m)^2 per
    # instance).  MFU = model FLOPs / wall / v5e bf16 peak (197 TF/s).
    tok = B * (n + mi + me)
    gate_flops = 2 * tok * (4 * h * (2 + h) + h)
    matvec_flops = 2 * B * 4 * (n + mi + me) ** 2
    flops_per_iter = 3 * (gate_flops + matvec_flops)
    out["model_flops_per_iter"] = flops_per_iter

    def derived(ms_per_iter):
        return dict(instance_iters_per_s=B / (ms_per_iter * 1e-3),
                    mfu=flops_per_iter / (ms_per_iter * 1e-3) / 197e12)

    if not args.skip_step:
        step_fn, impl = best_lstm_step()
        log(f"step impl: {impl}")
        chunk_step = make_train_chunk(step_fn, optimizer, K, K, 6e-6,
                                      remat=args.remat)
        st = init_state(B, n, mi + me, h, dtype=jnp.float32)
        best, l0 = time_chunk(chunk_step, dict(params), optimizer.init(params),
                              st, data, args.reps, f"step[{impl}]")
        out["step"] = dict(impl=impl, ms_per_iter=best * 1e3 / K,
                           chunk_s=best, loss0=l0,
                           **derived(best * 1e3 / K))
        log(f"step[{impl}]: {best * 1e3 / K:.3f} ms/iter "
            f"({out['step']['instance_iters_per_s']:.0f} inst_it/s, "
            f"MFU {out['step']['mfu']:.2f})")

    if not args.skip_fused:
        from iadmm_tpu.kernels.train_rollout import make_fused_chunk_loss
        variants = [("fused_stream", dict(stream=True)),
                    ("fused_recompute", dict(stream=False))]
        if args.variant != "both":
            variants = [v for v in variants if v[0].endswith(args.variant)]
        for key, kw in variants:
            try:
                fused_loss = make_fused_chunk_loss(
                    num_var=n, num_constr=mi + me, batch=B, hidden=h,
                    sigma=6e-6, chunk_len=K, outer_T=K, K_total=K,
                    compute_dtype="bfloat16",
                    interpret=jax.default_backend() != "tpu", **kw)
                chunk_fused = make_train_chunk(None, optimizer, K, K, 6e-6,
                                               loss_fn=fused_loss)
                st = init_state(B, n, mi + me, h, dtype=jnp.float32)
                # chunk updates donate params/opt_state buffers, so
                # re-materialize identical params per variant
                params = lstm_init(jax.random.PRNGKey(0), input_dim=2,
                                   hidden_dim=h, length=K)
                best, l0 = time_chunk(chunk_fused, dict(params),
                                      optimizer.init(params),
                                      st, data, args.reps, key)
                out[key] = dict(ms_per_iter=best * 1e3 / K, chunk_s=best,
                                loss0=l0, segment_len=fused_loss.segment_len,
                                **derived(best * 1e3 / K))
                log(f"{key}: {best * 1e3 / K:.3f} ms/iter "
                    f"({out[key]['instance_iters_per_s']:.0f} inst_it/s, "
                    f"MFU {out[key]['mfu']:.2f})")
            except Exception as e:  # e.g. VMEM/HBM overflow at large B
                out[key] = dict(error=f"{type(e).__name__}: {e}"[:300])
                log(f"{key} skipped: {out[key]['error']}")
        done = [out[k] for k, _ in variants
                if "ms_per_iter" in out.get(k, {})]
        if done:
            out["fused"] = min(done, key=lambda d: d["ms_per_iter"])

    if "step" in out and "ms_per_iter" in out.get("fused", {}):
        out["speedup"] = out["step"]["ms_per_iter"] / out["fused"]["ms_per_iter"]
        log(f"speedup fused vs step: {out['speedup']:.2f}x")

    os.makedirs("artifacts", exist_ok=True)
    hist = []
    path = "artifacts/train_bench.json"
    if os.path.exists(path):
        with open(path) as f:
            hist = json.load(f)
    hist.append(out)
    with open(path, "w") as f:
        json.dump(hist, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
