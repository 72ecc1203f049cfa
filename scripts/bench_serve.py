"""End-to-end serving-path benchmark: make_solver (scale -> learned rollout
-> Stage-II polish -> unscale -> residuals) at the flagship shape.

Times the full jitted solve with the megakernel rollout and each Stage-II
backend (fused Pallas kernel vs factor-once LU), host-fetch barriers
(CLAUDE.md: async backend).  Appends to artifacts/serve_bench.json.

Usage: python scripts/bench_serve.py [--reps 4] [--feas_rest 40]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_solve(solve, data, reps, label):
    t0 = time.perf_counter()
    r = solve(data)
    s = float(np.asarray(r.x).sum()) + float(np.asarray(r.primal_res).mean())
    log(f"{label}: compile+first {time.perf_counter() - t0:.1f}s "
        f"(sum={s:.3e}, primal={float(np.asarray(r.primal_res).mean()):.3e})")
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = solve(data)
        float(np.asarray(r.x).sum())
        times.append(time.perf_counter() - t0)
    best = min(times)
    pr = float(np.asarray(r.primal_res).mean())
    log(f"{label}: best {best * 1e3:.1f} ms for B={data.p.shape[0]} "
        f"-> {best * 1e3 / data.p.shape[0]:.2f} ms/instance, primal {pr:.3e}")
    return best, pr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--feas_rest", type=int, default=40)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--ckpt", default=None,
                    help="trained checkpoint dir (results/canonical/...); "
                         "with --dataset, serves real held-out instances")
    ap.add_argument("--dataset", default=None,
                    help="stacked npz to draw the batch from (tail slice)")
    ap.add_argument("--hidden", type=int, default=800)
    args = ap.parse_args()

    B, n, mi, me, K = args.batch, 1000, 500, 500, 100
    h = args.hidden
    log(f"backend: {jax.default_backend()}  devices: {jax.devices()}")

    from bench import make_data
    from iadmm_tpu.solvers.cells import lstm_init
    from iadmm_tpu.api import make_solver

    if args.dataset:
        from iadmm_tpu.problems.io import load_npz, to_qp_batch
        ds = load_npz(args.dataset).slice(np.arange(-args.batch, 0))
        data = to_qp_batch(ds)
        n, me = data.num_var, 0
        log(f"dataset batch: B={B} n={n} m={data.num_constr}")
    else:
        data = make_data(B, n, mi, me)
    if args.ckpt:
        from iadmm_tpu.train.checkpoint import load_checkpoint
        params = load_checkpoint(args.ckpt)["params"]
        log(f"loaded params from {args.ckpt}")
    else:
        params = lstm_init(jax.random.PRNGKey(0), input_dim=2, hidden_dim=h,
                           length=K)
    # kernel_rev: bump when kernels/stage2_kernel.py changes behaviour, so
    # append-only rows stay interpretable (VERDICT r3 weak #4).
    out = {"shape": dict(B=B, n=n, mi=mi, me=me, h=h, K=K,
                         feas_rest=args.feas_rest),
           "kernel_rev": 3,
           "date": time.strftime("%Y-%m-%d"),
           "solvers": {"fused": "stage2 kkt in-kernel solver",
                       "fused-direct": "stage2 explicit-M^-1 direct solver",
                       "lu": "XLA batched LU baseline"}}

    for s2 in ("fused", "fused-direct", "lu"):
        solve = make_solver(params, hidden_dim=h, num_iters=K,
                            feas_rest_num=args.feas_rest,
                            use_pallas=True, gate_dtype="bfloat16",
                            matvec_mode="bf16", rollout_impl="fused",
                            stage2_impl=s2)
        best, pr = time_solve(solve, data, args.reps, f"serve[stage2={s2}]")
        out[s2] = dict(total_s=best, ms_per_instance=best * 1e3 / B,
                       primal_res=pr)

    os.makedirs("artifacts", exist_ok=True)
    hist = []
    path = "artifacts/serve_bench.json"
    if os.path.exists(path):
        with open(path) as f:
            hist = json.load(f)
    hist.append(out)
    with open(path, "w") as f:
        json.dump(hist, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
