"""Pre-generate + oracle-label the canonical reference datasets (CPU-only).

Runs the reference's data protocol (generate_data.py families, OSQP-style
oracle at eps=1e-4) for every workload in run_workload.WORKLOADS that does
not already have a cached stacked npz.  Forces the CPU backend so it can run
while a TPU training job owns the chip.

Usage: python scripts/gen_datasets.py [family ...]   (default: all missing)
"""

import os
import sys
import time

os.environ.setdefault("OMP_NUM_THREADS", "3")

import jax
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from run_workload import WORKLOADS  # noqa: E402  (same dir)


def main():
    from iadmm_tpu.problems import generate, label_dataset
    from iadmm_tpu.problems.io import dataset_path, save_npz

    # Default order = the chip queue's needs: small/shared-LHS families
    # first so training can start while the big ones are still labeling.
    wanted = sys.argv[1:] or [k for k in ("QP_RHS", "QP", "Random_QP",
                                          "SVM", "QP_1500", "QP_RHS_1500",
                                          "Equality_QP")]
    for fam in wanted:
        w = WORKLOADS[fam]
        path = dataset_path("./datasets", w["prob_type"], w["num_var"],
                            w.get("num_ineq", 0), w.get("num_eq", 0))
        if os.path.exists(path):
            print(f"{fam}: cached at {path}", flush=True)
            continue
        t0 = time.time()
        ds = generate(w["prob_type"], num_var=w["num_var"],
                      num_ineq=w.get("num_ineq", 0),
                      num_eq=w.get("num_eq", 0), data_size=1000, seed=17)
        t1 = time.time()
        ids = label_dataset(ds, eps=1e-4, verbose=False)
        ds = ds.slice(np.asarray(ids))
        t2 = time.time()
        save_npz(ds, path)
        print(f"{fam}: gen {t1 - t0:.0f}s, label {t2 - t1:.0f}s "
              f"({len(ids)}/1000 solved) -> {path}", flush=True)


if __name__ == "__main__":
    main()
