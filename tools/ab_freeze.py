"""On-chip A/B: dynamic masked-tap fold vs trace-time frozen periods.

VERDICT r3 #1: measures the flagship (L=28) and long-context (L=512) train
step with the dynamic selector+masked fold vs ``frozen_periods`` static
specialization (spec snapshotted from a real forward's telemetry, exactly
like the trainer does). Prints one JSON line per cell.

Usage: python tools/ab_freeze.py [flagship l512]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _measure(cfg, batch, n1=8, n2=24, reps=2, want_spec=False):
    from bench import _make_engine_and_batch, _train_step_time
    from flow_timesnet_tpu.engine import Engine

    engine, state, dev_batch = _make_engine_and_batch(cfg, batch)
    spec = None
    if want_spec:
        # BEFORE timing: the timed scans donate the state buffers
        telemetry = engine.collect_period_telemetry(state.params, dev_batch)
        spec = Engine.frozen_spec_from_telemetry(telemetry, cfg.n_layers)
    step_s = _train_step_time(engine, state, dev_batch, n1=n1, n2=n2, reps=reps)
    return spec, {
        "ms_per_step": round(step_s * 1e3, 3),
        "windows_per_s": round(batch / step_s, 1),
    }


def run_cell(name, cfg, batch, n1=8, n2=24):
    import dataclasses

    spec, dyn = _measure(cfg, batch, n1=n1, n2=n2, want_spec=True)
    print(json.dumps({"cell": name, "mode": "dynamic", **dyn}), flush=True)

    periods = sorted({p for layer in spec for p, _, v in layer if v})
    fcfg = dataclasses.replace(cfg, frozen_periods=spec)
    _, frz = _measure(fcfg, batch, n1=n1, n2=n2)
    print(
        json.dumps({"cell": name, "mode": "frozen", "periods": periods, **frz}),
        flush=True,
    )


def flagship():
    from __graft_entry__ import _flagship_cfg

    run_cell("flagship", _flagship_cfg(), 256)


def l512():
    from bench import _recipe_cfg

    cfg, b = _recipe_cfg("long_context.yaml")
    run_cell("l512", cfg, b, n1=4, n2=12)


if __name__ == "__main__":
    cells = sys.argv[1:] or ["flagship", "l512"]
    for cell in cells:
        globals()[cell]()
