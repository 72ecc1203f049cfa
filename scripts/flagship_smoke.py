"""Flagship-workload smoke run on real hardware.

Trains the QP_1000_500_500 / K=100 / h=800 configuration (reference:
scripts/Synthetic.sh:3-5) on a reduced dataset for a few epochs with the
Pallas fast profile, then evaluates per-iteration residual traces and
Stage-II polish.  Writes a JSON summary to results/flagship_smoke.json.

Usage: python scripts/flagship_smoke.py [--data_size 64] [--epochs 3]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_size", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--hidden", type=int, default=800)
    ap.add_argument("--outer_T", type=int, default=100)
    ap.add_argument("--out", default="results/flagship_smoke.json")
    ap.add_argument("--resume", action="store_true",
                    help="continue from the run-keyed checkpoint")
    args = ap.parse_args()

    import jax
    import iadmm_tpu as it
    from iadmm_tpu.problems import generate, label_dataset
    from iadmm_tpu.train import harness
    from iadmm_tpu.evaluation.driver import run_test

    print("backend:", jax.default_backend(), flush=True)
    t0 = time.time()
    ds = generate("QP", num_var=1000, num_ineq=500, num_eq=500,
                  data_size=args.data_size, seed=17)
    print(f"generated in {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    ids = label_dataset(ds, eps=1e-4, verbose=True)
    print(f"labeled in {time.time()-t0:.1f}s", flush=True)
    ds = ds.slice(np.asarray(ids))

    cfg = it.ExperimentConfig(
        prob_type="QP", num_var=1000, num_ineq=500, num_eq=500,
        data_size=ds.size, hidden_dim=args.hidden, outer_T=args.outer_T,
        truncated_length=args.outer_T, test_outer_T=args.outer_T,
        batch_size=2, test_batch_size=4, lr=5e-5, sigma=6e-6,
        num_epoch=args.epochs, val_frac=0.1, test_frac=0.1, eq_tol=1e9,
        scaling=True, use_pallas=True, gate_dtype="bfloat16",
        matvec_mode="bf16", resume=args.resume,
        save_dir="results/flagship_smoke")
    t0 = time.time()
    res = harness.train(cfg, ds, verbose=True)
    t_train = time.time() - t0
    print(f"train {t_train:.1f}s total", flush=True)

    rep = run_test(cfg, ds, res.params, verbose=True)
    out = dict(
        epochs=res.epochs_run,
        train_history=res.history,
        final_primal_res=float(rep.primal_res[-1]),
        final_dual_res=float(rep.dual_res[-1]),
        oracle_gap=rep.oracle_gap,
        parallel_time=rep.parallel_time,
        primal_res_curve=[float(v) for v in rep.primal_res],
        dual_res_curve=[float(v) for v in rep.dual_res],
        train_time_s=t_train,
    )
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("summary ->", args.out, flush=True)


if __name__ == "__main__":
    main()
