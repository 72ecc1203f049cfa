"""Test / inference CLI (reference test branch: main.py:549-1268).

Loads the run-keyed checkpoint, evaluates the test split with per-iteration
traces, optional Stage-II feasibility restoration (``--feas_rest``),
optional trace export (``--save_sol``), and an optional classical-solver
baseline (``--baseline osqp``, ghost models/osqp.py parity).
"""

from __future__ import annotations

import os
import sys

from . import config_parser, parse_config
from ..problems.io import load_dataset
from ..train import checkpoint as ckpt
from ..evaluation.driver import run_test, export_traces, run_osqp_baseline


def main(argv=None) -> int:
    p = config_parser(__doc__)
    p.add_argument("--load_path", default=None,
                   help="explicit checkpoint path (default: run-keyed)")
    p.add_argument("--baseline", choices=["none", "osqp"], default="none")
    p.add_argument("--export", default=None,
                   help="trace export path (.mat or .npz); implies save_sol")
    args = p.parse_args(argv)
    cfg = parse_config(args)

    ds = load_dataset(cfg.data_root, cfg.prob_type, cfg.num_var,
                      cfg.num_ineq, cfg.num_eq, cfg.qplib_num,
                      cfg.data_size)
    cfg.data_size = min(cfg.data_size, ds.size)

    load_path = args.load_path or ckpt.checkpoint_path(
        cfg.save_dir, cfg.model_name, cfg.run_name())
    payload = ckpt.load_checkpoint(load_path)
    params = payload["params"] if "params" in payload else payload

    report = run_test(cfg, ds, params, verbose=True)
    if args.export or cfg.save_sol:
        out = args.export or os.path.join(
            cfg.save_dir, cfg.model_name, cfg.run_name() + ".mat")
        export_traces(report, out)
        print(f"traces -> {out}")
    if args.baseline == "osqp":
        run_osqp_baseline(cfg, ds, verbose=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
