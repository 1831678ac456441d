"""Per-phase wall-clock breakdown of the real (device-resident) epoch loop.

Wraps the Engine phase methods with timers, runs ``train_once`` on the
flagship demand-benchmark recipe for a few epochs, and prints seconds spent
per epoch in each phase: the epoch scan itself, period telemetry, the
resident eval pass, best-params fetch and artifact writes. This is the
evidence tool for closing the steady-state (epoch-log) vs isolated-program
throughput gap (STATUS.md round 3 headline table).

Usage: python tools/epoch_breakdown.py [--epochs 4] [--config configs/demand_benchmark.yaml]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time
from collections import defaultdict

sys.path.insert(0, ".")

PHASES = defaultdict(float)
COUNTS = defaultdict(int)
CALLS = defaultdict(list)


def _timed(obj, name, label):
    orig = getattr(obj, name)

    @functools.wraps(orig)
    def wrapper(*a, **k):
        t0 = time.perf_counter()
        out = orig(*a, **k)
        dt = time.perf_counter() - t0
        PHASES[label] += dt
        COUNTS[label] += 1
        CALLS[label].append(dt)
        return out

    setattr(obj, name, wrapper)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/demand_benchmark.yaml")
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--override", action="append", default=[],
                    help="extra dotted config overrides (e.g. train.device=cpu)")
    args = ap.parse_args()

    from flow_timesnet_tpu import train as train_mod
    from flow_timesnet_tpu.config import PipelineConfig
    from flow_timesnet_tpu.engine import Engine

    _timed(Engine, "train_epoch_resident", "epoch_scan")
    _timed(Engine, "collect_period_telemetry", "telemetry")
    _timed(Engine, "collect_period_telemetry_staged", "telemetry")
    _timed(Engine, "evaluate_resident", "eval")
    _timed(Engine, "gather_staged_batch", "telemetry_gather")
    _timed(train_mod, "host_fetch", "host_fetch")
    _timed(train_mod, "device_snapshot", "best_snapshot")
    _timed(train_mod.artifacts_io, "save_checkpoint", "save_checkpoint")
    _timed(train_mod.artifacts_io, "save_train_state", "save_train_state")

    cfg = PipelineConfig.from_files(
        args.config,
        overrides=[
            f"train.epochs={args.epochs}",
            "train.early_stopping_patience=999",
            "artifacts.dir=outputs/epoch_breakdown/artifacts",
            "submission.out_path=outputs/epoch_breakdown/submission.csv",
            *args.override,
        ],
    )

    t0 = time.perf_counter()
    train_mod.train_once(cfg)
    total = time.perf_counter() - t0

    print("\n=== per-phase totals over the whole run ===")
    accounted = 0.0
    for label in sorted(PHASES, key=PHASES.get, reverse=True):
        per_call = ", ".join(f"{t:.2f}" for t in CALLS[label][:12])
        print(
            f"{label:18s} {PHASES[label]:8.2f} s  ({COUNTS[label]} calls: "
            f"[{per_call}])"
        )
        accounted += PHASES[label]
    print(f"{'accounted':18s} {accounted:8.2f} s of {total:.2f} s total "
          f"({100 * accounted / total:.1f}%); rest = startup/compile/staging/IO")
    print(f"per-epoch means over {args.epochs} epochs: "
          + ", ".join(
              f"{label}={PHASES[label] / args.epochs:.2f}s"
              for label in sorted(PHASES, key=PHASES.get, reverse=True)
          ))


if __name__ == "__main__":
    main()
