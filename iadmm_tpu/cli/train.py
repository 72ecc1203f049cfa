"""Training CLI (reference train branch: main.py:187-547).

Loads (or generates on the fly with ``--generate``) the dataset, runs the
TBPTT harness, and writes the tolerance-gated best checkpoint.
"""

from __future__ import annotations

import os
import sys

from . import config_parser, parse_config
from ..problems.io import load_dataset, dataset_path
from ..train.harness import train


def main(argv=None) -> int:
    p = config_parser(__doc__)
    p.add_argument("--generate", action="store_true",
                   help="generate+label the dataset if the .npz is missing")
    args = p.parse_args(argv)
    cfg = parse_config(args)

    path = dataset_path(cfg.data_root, cfg.prob_type, cfg.num_var,
                        cfg.num_ineq, cfg.num_eq)
    if cfg.prob_type != "QPLIB" and not os.path.exists(path) \
            and args.generate:
        from .generate_data import main as gen_main
        gen_main(["--prob_type", cfg.prob_type,
                  "--num_var", str(cfg.num_var),
                  "--num_ineq", str(cfg.num_ineq),
                  "--num_eq", str(cfg.num_eq),
                  "--data_size", str(cfg.data_size),
                  "--seed", str(cfg.seed),
                  "--data_root", cfg.data_root])
    ds = load_dataset(cfg.data_root, cfg.prob_type, cfg.num_var,
                      cfg.num_ineq, cfg.num_eq, cfg.qplib_num,
                      cfg.data_size)
    if ds.size < cfg.data_size:
        print(f"note: dataset has {ds.size} < data_size={cfg.data_size}; "
              f"using {ds.size}")
        cfg.data_size = ds.size
    result = train(cfg, ds, verbose=True)
    print(f"done: {result.epochs_run} epochs, best val obj "
          f"{result.best_val_obj}, checkpoint {result.checkpoint_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
