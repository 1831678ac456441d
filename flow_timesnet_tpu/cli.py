"""Command-line interface: ``flow-timesnet train | predict | tune``.

Mirrors the reference console script surface
(``/root/reference/src/timesnet_forecast/cli.py``): every subcommand takes a
``--config`` YAML plus dotted ``--override key=value`` pairs.
"""

from __future__ import annotations

import argparse
from typing import List, Optional

from .config import PipelineConfig
from .utils.logging import console


def cmd_train(args: argparse.Namespace) -> None:
    from .train import train_once

    cfg = PipelineConfig.from_files(args.config, overrides=args.override)
    best_nll, paths = train_once(cfg)
    console().print(f"[bold magenta]Final best NLL: {best_nll:.6f}[/bold magenta]")


def cmd_predict(args: argparse.Namespace) -> None:
    from .predict import predict_once

    cfg = PipelineConfig.from_files(args.config, overrides=args.override)
    predict_once(cfg)


def cmd_evaluate(args: argparse.Namespace) -> None:
    from .evaluate import evaluate_once

    cfg = PipelineConfig.from_files(args.config, overrides=args.override)
    evaluate_once(cfg)


def cmd_tune(args: argparse.Namespace) -> None:
    from .tune import tune

    cfg = PipelineConfig.from_files(args.config, overrides=args.override)
    tune(cfg, args.search_space, n_trials=args.n_trials)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="flow-timesnet",
        description="TPU-native TimesNet demand forecasting pipeline",
    )
    sub = parser.add_subparsers(dest="command", required=True)

    def add_common(p: argparse.ArgumentParser) -> None:
        p.add_argument("--config", type=str, default="configs/default.yaml")
        p.add_argument(
            "--override",
            nargs="*",
            action="append",
            default=[],
            help=(
                "Dotted key=value overrides (e.g. window.input_len=64); "
                "repeatable and accepts multiple pairs per flag"
            ),
        )

    p_train = sub.add_parser("train", help="Train and emit artifacts")
    add_common(p_train)
    p_train.set_defaults(func=cmd_train)

    p_pred = sub.add_parser("predict", help="Run inference from stored artifacts")
    add_common(p_pred)
    p_pred.set_defaults(func=cmd_predict)

    p_eval = sub.add_parser("evaluate", help="Score stored artifacts on a holdout CSV")
    add_common(p_eval)
    p_eval.set_defaults(func=cmd_evaluate)

    p_tune = sub.add_parser("tune", help="Hyper-parameter search around train_once")
    add_common(p_tune)
    p_tune.add_argument("--search-space", type=str, default="configs/search_space.yaml")
    p_tune.add_argument("--n-trials", type=int, default=None)
    p_tune.set_defaults(func=cmd_tune)
    return parser


def main(argv: Optional[List[str]] = None) -> None:
    parser = build_parser()
    args = parser.parse_args(argv)
    # --override is repeatable (action=append) and multi-valued (nargs=*):
    # argparse yields a list of lists — flatten before config parsing.
    args.override = [o for group in args.override for o in group]
    args.func(args)


if __name__ == "__main__":
    main()
