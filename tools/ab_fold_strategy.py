"""On-chip A/B of the fold contraction strategy (round 3).

Compares scan-slope ms/step of the full flagship train step across
``FLOW_TIMESNET_FOLD_STRATEGY`` in {auto, tapsum} (and optionally rowsum),
at the flagship shape and the long-context shape. ``tapsum`` replaces the
materialized [K, B, Lp, kh*kw*Cin] tap-stack matmul with accumulated
per-tap [Cin, Cout] matmuls — no stack HBM traffic, more-but-smaller
matmuls. The step is bandwidth-bound at ~14% MFU, so this trades the
scarce resource (HBM bytes) for the abundant one (MXU FLOPs).

The strategy env var is read at trace time, so each cell re-execs itself
with the env set before importing jax.

Usage: python tools/ab_fold_strategy.py [flagship l512] [--strategies auto tapsum rowsum]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _measure_cell(cell: str) -> None:
    from __graft_entry__ import _flagship_cfg
    from bench import _make_engine_and_batch, _train_step_time

    if cell == "flagship":
        cfg = _flagship_cfg(compute_dtype="bfloat16")
        batch, n1, n2 = 256, 8, 24
    elif cell == "l512":
        cfg = _flagship_cfg(
            input_len=512, pred_len=24, d_ff=256, k_periods=4,
            kernel_set=((3, 3), (5, 5)), compute_dtype="bfloat16",
            min_period_threshold=2,
        )
        batch, n1, n2 = 64, 4, 12
    else:
        raise SystemExit(f"unknown cell {cell!r}")
    engine, state, dev_batch = _make_engine_and_batch(cfg, batch)
    step_s = _train_step_time(engine, state, dev_batch, n1=n1, n2=n2, reps=2)
    print(
        json.dumps(
            {
                "cell": cell,
                "strategy": os.environ.get("FLOW_TIMESNET_FOLD_STRATEGY", "auto"),
                "ms_per_step": round(step_s * 1e3, 3),
                "windows_per_s": round(batch / step_s, 1),
            }
        ),
        flush=True,
    )


def main() -> None:
    if os.environ.get("_AB_FOLD_CELL"):
        _measure_cell(os.environ["_AB_FOLD_CELL"])
        return
    args = sys.argv[1:]
    strategies = ["auto", "tapsum"]
    if "--strategies" in args:
        i = args.index("--strategies")
        strategies = args[i + 1:]
        args = args[:i]
    cells = args or ["flagship", "l512"]
    for cell in cells:
        for strategy in strategies:
            env = dict(
                os.environ,
                _AB_FOLD_CELL=cell,
                FLOW_TIMESNET_FOLD_STRATEGY=strategy,
            )
            subprocess.run([sys.executable, os.path.abspath(__file__)], env=env, check=False)


if __name__ == "__main__":
    main()
