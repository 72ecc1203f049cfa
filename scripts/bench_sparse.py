"""Density-crossover bench: dense MXU bmv vs BSR Pallas tiles vs BCOO.

Answers "at what sparsity does the device sparse path win?" for the ADMM
hot matvec (A0·x — reference surface: the torch.bmm KKT matvecs,
models/lstm.py:67-72).  Sweeps banded (B, 1000, 1000) operands from ~2%
to 100% element density and times, per matvec:

  * dense   — solvers.step.bmv in the bf16 fast profile (training/serving
              default),
  * bsr     — kernels/sparse_matvec.bsr_matvec with VPU-aligned (8, 128)
              tiles (and the MXU-aligned (128, 128) tiling for contrast),
  * bcoo    — jax.experimental.sparse BCOO @ v (what kernels/sparse.py's
              training route lowers to).

Each timing iterates the matvec ITERS times inside one jit (lax.fori_loop,
carrying the output into the next input) so per-dispatch tunnel latency
does not swamp sub-ms kernels; a host fetch closes each measurement (the
axon backend is fully async).

Writes artifacts/sparse_bench.json.

Usage: python scripts/bench_sparse.py [--n 1000] [--batch 8] [--reps 3]
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
from jax.experimental import sparse as jsparse


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def banded(rng, batch, n, w):
    """(batch, n, n) f32 band of half-width w (density ≈ (2w+1)/n)."""
    idx = np.arange(n)
    mask = np.abs(idx[:, None] - idx[None, :]) <= w
    M = rng.standard_normal((batch, n, n)).astype(np.float32)
    M *= mask
    return M


def time_iterated(fn, v0, iters, reps, label):
    """fn: v -> v (one matvec, shape-preserving).  Returns best s/matvec."""
    @jax.jit
    def loop(v):
        return jax.lax.fori_loop(0, iters, lambda _, x: fn(x), v)

    t0 = time.perf_counter()
    float(np.asarray(loop(v0)).sum())          # compile + first (fetch)
    log(f"  {label}: compile+first {time.perf_counter() - t0:.1f}s")
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(loop(v0)).sum())
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def bench_full_step(n, m, batch, hidden, bandwidth, iters, reps, on_tpu):
    """End-to-end learned ADMM step: dense bf16 profile vs the BSR sparse
    route on a banded instance (the quantity the training loop actually
    pays per iteration)."""
    from iadmm_tpu.problems.generators import generate
    from iadmm_tpu.problems.io import to_qp_batch
    from iadmm_tpu.solvers.step import make_lstm_step
    from iadmm_tpu.solvers.cells import lstm_init
    from iadmm_tpu.types import init_state
    from iadmm_tpu.kernels import sparse as sp

    ds = generate("Sparse_QP", num_var=n, num_ineq=m, data_size=batch,
                  seed=7, bandwidth=bandwidth)
    data = to_qp_batch(ds, with_metric_views=False)
    data_bf = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.ndim == 3 else a, data)
    sdata = sp.from_dense(data, fmt="bsr", dtype=jnp.bfloat16,
                          interpret=not on_tpu)
    params = lstm_init(jax.random.PRNGKey(0), 2, hidden, iters)
    st0 = init_state(batch, n, m, hidden)
    sigma = jnp.float32(6e-6)
    dense_step = make_lstm_step(use_pallas=on_tpu, gate_dtype="bfloat16",
                                matvec_mode="bf16")

    def mk(step, d):
        def roll(st):
            def body(st, t):
                return step(params, t, st, d, sigma), None
            st, _ = jax.lax.scan(body, st, jnp.arange(iters))
            return st
        return jax.jit(roll)

    out = {}
    for label, fn in (("dense_step", mk(dense_step, data_bf)),
                      ("bsr_step", mk(
                          lambda p, t, st, d, s: sp.sparse_lstm_step(
                              p, t, st, d, s), sdata))):
        t0 = time.perf_counter()
        float(np.asarray(fn(st0).x).sum())
        log(f"  {label}: compile+first {time.perf_counter() - t0:.1f}s")
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(fn(st0).x).sum())
            best = min(best, (time.perf_counter() - t0) / iters)
        log(f"  {label}: {best * 1e3:.2f} ms/step")
        out[label + "_s"] = best
    out["step_speedup"] = out["dense_step_s"] / out["bsr_step_s"]
    log(f"  -> full-step BSR speedup {out['step_speedup']:.2f}x")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--widths", type=int, nargs="*",
                    default=[8, 16, 64, 128, 256])
    ap.add_argument("--step_bench", action="store_true",
                    help="also time the full learned ADMM step (dense bf16 "
                         "profile vs BSR route) at --n with bandwidth 16")
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the sitecustomize pins "
                         "axon before env vars are read)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from iadmm_tpu.solvers.step import bmv
    from iadmm_tpu.kernels import sparse_matvec as sm

    on_tpu = jax.default_backend() == "tpu"
    log(f"backend: {jax.default_backend()}  n={args.n} B={args.batch}")
    rng = np.random.default_rng(11)
    v0 = jnp.asarray(rng.standard_normal((args.batch, args.n)), jnp.float32)
    rows = []

    def renorm(y):
        # keep the carried vector O(1) across iterations
        return y / (jnp.linalg.norm(y, axis=-1, keepdims=True) + 1e-6)

    for w in list(args.widths) + [None]:
        if w is None:
            M = rng.standard_normal(
                (args.batch, args.n, args.n)).astype(np.float32)
            density = 1.0
        else:
            M = banded(rng, args.batch, args.n, w)
            density = float((M[0] != 0).mean())
        log(f"width={w} density={density:.3f}")
        row = {"bandwidth": w, "density": density}

        # bf16 STORAGE (the training preload profile): the fair dense
        # baseline at HBM-resident sizes — an f32-stored operand would pay
        # a 2x read penalty the real training path doesn't.
        Md = jnp.asarray(M).astype(jnp.bfloat16)
        row["dense_bf16_s"] = time_iterated(
            lambda x: renorm(bmv(Md, x, mode="bf16")), v0,
            args.iters, args.reps, "dense bf16")

        for tile, dt in (((8, 128), jnp.float32), ((8, 128), jnp.bfloat16),
                         ((128, 128), jnp.bfloat16)):
            bsr = sm.bsr_from_dense(M, tile=tile, dtype=dt)
            key = f"bsr{tile[0]}x{tile[1]}_{jnp.dtype(dt).name}"
            row[key + "_occupancy"] = float(bsr.occupancy)
            row[key + "_s"] = time_iterated(
                lambda x, b=bsr: renorm(
                    sm.bsr_matvec(b, x, interpret=not on_tpu)),
                v0, args.iters, args.reps, key)

        nse = max(int((np.asarray(M) != 0).sum(axis=(1, 2)).max()), 1)
        # Guard: the BCOO program at nse≈3.6M (density 0.45, n=1000, B=8)
        # crashed the axon TPU worker outright in round 3 (CLAUDE.md).  At
        # those densities BCOO has already lost to dense by construction
        # (gather traffic > streaming the dense rows), so skip rather than
        # risk taking the whole sweep down.
        bcoo_cap = 2_500_000
        if on_tpu and nse > bcoo_cap:
            row["bcoo_skipped"] = (f"nse={nse} > {bcoo_cap} "
                                   "(crashes the axon TPU worker)")
            log(f"  bcoo skipped: {row['bcoo_skipped']}")
        else:
            Mb = jsparse.BCOO.fromdense(jnp.asarray(M), nse=nse, n_batch=1)
            try:
                row["bcoo_s"] = time_iterated(
                    lambda x: renorm(jsparse.bcoo_dot_general(
                        Mb, x,
                        dimension_numbers=(((2,), (1,)), ((0,), (0,))))),
                    v0, args.iters, args.reps, "bcoo")
            except Exception as e:
                row["bcoo_error"] = f"{type(e).__name__}: {e}"[:200]
                log(f"  bcoo failed: {row['bcoo_error']}")

        best_sparse = min(v for k, v in row.items()
                          if k.endswith("_s") and k != "dense_bf16_s")
        row["sparse_speedup_vs_dense"] = row["dense_bf16_s"] / best_sparse
        log(f"  -> dense {row['dense_bf16_s']*1e6:.0f} us, best sparse "
            f"{best_sparse*1e6:.0f} us ({row['sparse_speedup_vs_dense']:.2f}x)")
        rows.append(row)
        # Incremental write: the axon worker can crash mid-sweep (it did at
        # density 0.45 in round 3) — keep the densities already measured.
        # Non-default n gets its own artifact (the n=1000 round-4 sweep
        # stays intact).
        out = {"n": args.n, "batch": args.batch, "iters": args.iters,
               "backend": jax.default_backend(), "rows": rows}
        out_path = ("artifacts/sparse_bench.json" if args.n == 1000
                    else f"artifacts/sparse_bench_n{args.n}.json")
        os.makedirs("artifacts", exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1)

    if args.step_bench:
        out["full_step"] = bench_full_step(
            args.n, max(args.n // 4, 128), args.batch, args.hidden,
            16, args.iters, args.reps, on_tpu)
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
