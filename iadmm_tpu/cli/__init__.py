"""CLI entry points (reference surface: ``python main.py --config ... ``,
reference: README.md:37-44, split into explicit subcommands):

  python -m iadmm_tpu.cli.generate_data --prob_type QP --num_var 100 ...
  python -m iadmm_tpu.cli.train         --config configs/qp_small.yaml ...
  python -m iadmm_tpu.cli.test          --config ... --feas_rest ...

Flags mirror every live knob of the reference (SURVEY.md §5) via
:class:`iadmm_tpu.config.ExperimentConfig`; CLI overrides win over YAML,
and unknown keys are hard errors.
"""

from __future__ import annotations

import argparse
import dataclasses

from ..config import ExperimentConfig


def config_parser(description: str) -> argparse.ArgumentParser:
    """argparse parser auto-derived from ExperimentConfig fields."""
    p = argparse.ArgumentParser(description=description)
    p.add_argument("-c", "--config", default=None,
                   help="YAML config file (CLI flags override it)")
    for f in dataclasses.fields(ExperimentConfig):
        arg = f"--{f.name}"
        if f.type in ("bool", bool):
            # nargs='?' + const=True lets bare '--feas_rest' work like the
            # reference's store_true flags while still accepting an explicit
            # '--feas_rest false' (ADVICE round 1).
            p.add_argument(arg, default=None, nargs="?", const=True,
                           type=lambda s: s.lower() in ("1", "true", "yes"),
                           help=f"(bool, default {f.default})")
        else:
            typ = {int: int, float: float, str: str}.get(
                {"int": int, "float": float, "str": str}.get(f.type, f.type),
                str)
            p.add_argument(arg, default=None, type=typ,
                           help=f"(default {f.default})")
    return p


def parse_config(args: argparse.Namespace) -> ExperimentConfig:
    overrides = {f.name: getattr(args, f.name)
                 for f in dataclasses.fields(ExperimentConfig)
                 if getattr(args, f.name, None) is not None}
    if args.config:
        return ExperimentConfig.from_yaml(args.config, **overrides)
    return ExperimentConfig.from_dict(overrides)
