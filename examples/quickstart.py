"""Quickstart: generate -> label -> train -> solve, on CPU in ~a minute.

    python examples/quickstart.py

For real workloads use the CLI (`python -m iadmm_tpu.cli.train ...`) and
the canonical configs under configs/ and scripts/synthetic.sh.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    if jax.default_backend() not in ("tpu",):
        jax.config.update("jax_platforms", "cpu")

    import iadmm_tpu as it
    from iadmm_tpu.problems import generate, label_dataset, to_qp_batch
    from iadmm_tpu.train import harness

    # 1. A small synthetic QP family, oracle-labeled (native C++ solver).
    ds = generate("QP", num_var=40, num_ineq=20, num_eq=20, data_size=48,
                  seed=0)
    solved = label_dataset(ds, eps=1e-5)
    print(f"oracle solved {len(solved)}/{ds.size}")

    # 2. Train the learned inexact-ADMM LSTM for a few epochs.
    cfg = it.ExperimentConfig(
        prob_type="QP", num_var=40, num_ineq=20, num_eq=20, data_size=48,
        hidden_dim=48, outer_T=20, truncated_length=10, batch_size=8,
        lr=2e-3, num_epoch=6, val_frac=0.25, test_frac=0.0, eq_tol=1e9,
        save_dir="/tmp/iadmm_quickstart")
    res = harness.train(cfg, ds)

    # 3. Solve new instances with the trained model + Stage-II polish.
    fresh = generate("QP", num_var=40, num_ineq=20, num_eq=20,
                     data_size=8, seed=123)
    batch = to_qp_batch(fresh)
    solve = it.make_solver(res.params, hidden_dim=cfg.hidden_dim,
                           num_iters=cfg.outer_T, sigma=cfg.sigma,
                           feas_rest_num=30)
    out = solve(batch)
    print("primal residual:", np.round(np.asarray(out.primal_res), 5))
    print("objective:      ", np.round(np.asarray(out.obj), 3))


if __name__ == "__main__":
    main()
