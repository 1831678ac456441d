"""On-chip timing A/B for ``model.period_cap`` at flagship (round 3).

The flagship telemetry shows the selector picking periods {7, 27} — the
27-day pick sits at the L-1 boundary and drives the fold extent to
Lp = 55 (~2x overcompute, the gap between raw and useful MFU in bench).
``period_cap`` statically shrinks that extent (no cond, no remat — unlike
``period_buckets``). This tool measures the speed side of the trade:
scan-slope ms/step at a ladder of caps. The quality side (does clamping
the monthly pick hurt val NLL / test sMAPE?) is a separate full train run
on the 48-series subset.

Usage: python tools/ab_period_cap.py [cap ...]   (default: none 14 8)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from bench import _make_engine_and_batch, _train_step_time
    from __graft_entry__ import _flagship_cfg

    caps = sys.argv[1:] or ["none", "14", "8"]
    for raw in caps:
        cap = None if raw.lower() == "none" else int(raw)
        cfg = _flagship_cfg(compute_dtype="bfloat16", period_cap=cap)
        engine, state, dev_batch = _make_engine_and_batch(cfg, 256)
        step_s = _train_step_time(engine, state, dev_batch, n1=8, n2=24, reps=2)
        print(
            json.dumps(
                {
                    "cell": "period_cap_flagship",
                    "period_cap": cap,
                    "ms_per_step": round(step_s * 1e3, 3),
                    "windows_per_s": round(256 / step_s, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
