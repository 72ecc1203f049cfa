"""Dataset generation CLI (reference: generate_data.py:15-29 +
scripts/Generate_data.sh).  Generates a synthetic family, labels every
instance with the QP oracle at the reference's 1e-4 tolerance
(reference: generate_data.py:78-83), drops unsolved instances (reference
skip-on-failure, generate_data.py:93-94), and writes one stacked ``.npz``.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from ..problems.generators import generate, FAMILIES
from ..problems.oracle import label_dataset
from ..problems.io import save_npz, dataset_path


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--prob_type", choices=FAMILIES, default="QP")
    p.add_argument("--num_var", type=int, default=100)
    p.add_argument("--num_ineq", type=int, default=50)
    p.add_argument("--num_eq", type=int, default=50)
    p.add_argument("--data_size", type=int, default=1000)
    p.add_argument("--seed", type=int, default=17)
    p.add_argument("--data_root", default="./datasets")
    p.add_argument("--eps", type=float, default=1e-4,
                   help="oracle tolerance (reference: generate_data.py:79)")
    p.add_argument("--no_label", action="store_true",
                   help="skip oracle labeling (fast, for smoke tests)")
    p.add_argument("--out", default=None, help="explicit output path")
    args = p.parse_args(argv)

    ds = generate(args.prob_type, num_var=args.num_var,
                  num_ineq=args.num_ineq, num_eq=args.num_eq,
                  data_size=args.data_size, seed=args.seed)
    if not args.no_label:
        solved = label_dataset(ds, eps=args.eps, verbose=True)
        if len(solved) < ds.size:
            print(f"dropping {ds.size - len(solved)} unsolved instances")
            ds = ds.slice(np.asarray(solved))
    path = args.out or dataset_path(args.data_root, args.prob_type,
                                    args.num_var, args.num_ineq, args.num_eq)
    save_npz(ds, path)
    print(f"wrote {ds.size} instances -> {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
