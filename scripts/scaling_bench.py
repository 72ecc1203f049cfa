"""Data-parallel scaling efficiency benchmark.

Measures TBPTT training-chunk throughput (instance-iterations/s) at mesh
sizes 1..N and reports scaling efficiency vs the single-device baseline
(BASELINE.md target: >80% from 1 chip to >=2 hosts).  Runs on any device
set — a real pod slice, or a faked CPU mesh for plumbing validation:

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/scaling_bench.py --hidden 64 --n 64 --K 8

On multi-host pods, launch one process per host with --coordinator etc.
(see iadmm_tpu.dist.initialize_distributed).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--m", type=int, default=256)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--K", type=int, default=20)
    ap.add_argument("--per_device_batch", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    # Honour JAX_PLATFORMS=cpu even when a sitecustomize already imported
    # jax against another backend (see tests/conftest.py).
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from iadmm_tpu import dist
    from iadmm_tpu.problems.generators import generate
    from iadmm_tpu.problems.io import to_qp_batch
    from iadmm_tpu.solvers.cells import lstm_init
    from iadmm_tpu.solvers.step import lstm_step
    from iadmm_tpu.train.harness import make_optimizer, make_train_chunk
    from iadmm_tpu.types import init_state

    devs = jax.devices()
    print(f"{len(devs)} devices: {devs[0].platform}", flush=True)
    results = {}
    sizes = [d for d in (1, 2, 4, 8, 16, 32) if d <= len(devs)]
    for nd in sizes:
        B = args.per_device_batch * nd
        ds = generate("QP", num_var=args.n, num_ineq=args.m // 2,
                      num_eq=args.m - args.m // 2, data_size=B, seed=1)
        data = to_qp_batch(ds)
        params = lstm_init(jax.random.PRNGKey(0), 2, args.hidden, args.K)
        opt = make_optimizer(1e-4)
        opt_state = opt.init(params)
        chunk = make_train_chunk(lstm_step, opt, args.K, args.K, 6e-6)
        mesh = dist.make_mesh(nd) if nd > 1 else None
        if mesh is not None:
            params = dist.replicate(params, mesh)
            opt_state = dist.replicate(opt_state, mesh)
            data = dist.shard_batch(data, mesh)

        def run_once(params, opt_state):
            st = init_state(B, args.n, args.m, args.hidden)
            if mesh is not None:
                st = dist.shard_batch(st, mesh)
            params, opt_state, st, loss = chunk(params, opt_state, st,
                                                data, jnp.asarray(0))
            return params, opt_state, float(loss)

        params, opt_state, _ = run_once(params, opt_state)  # compile
        best = 1e9
        for _ in range(args.reps):
            t0 = time.perf_counter()
            params, opt_state, _ = run_once(params, opt_state)
            best = min(best, time.perf_counter() - t0)
        ips = B * args.K / best
        results[nd] = ips
        eff = ips / (results[1] * nd) if 1 in results and nd > 1 else 1.0
        print(f"devices={nd:3d}  B={B:4d}  {ips:10.1f} instance_iters/s  "
              f"efficiency={eff * 100:5.1f}%", flush=True)


if __name__ == "__main__":
    main()
