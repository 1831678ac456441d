"""On-chip A/B matrix for the flagship train step (VERDICT r2 #2b/#2c).

Measures scan-slope ms/step for:
  1. period_buckets off vs "auto" (flagship + L=512)  — is the bucket ladder
     worth enabling in the shipped recipes?
  2. batch scaling B=256/512/1024 with the default tap-stack threshold vs an
     unbounded one — is the inverted throughput curve the fold strategy's
     per-row switch or genuine HBM pressure?

Writes one JSON line per cell so results can be tabulated into STATUS.md.

Usage:  python tools/ab_flagship.py [cell ...]
  cells: buckets_flagship buckets_l512 batch_curve
  (default: all). FLOW_TIMESNET_TAP_STACK_BYTES is read at import time by
  ops.fold, so the batch_curve cell re-execs itself per threshold.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _measure(cfg, batch, n1=8, n2=24):
    from bench import _make_engine_and_batch, _train_step_time

    engine, state, dev_batch = _make_engine_and_batch(cfg, batch)
    step_s = _train_step_time(engine, state, dev_batch, n1=n1, n2=n2, reps=2)
    return {"ms_per_step": round(step_s * 1e3, 3),
            "windows_per_s": round(batch / step_s, 1)}


def buckets_flagship():
    from __graft_entry__ import _flagship_cfg

    for buckets in (None, "auto"):
        cfg = _flagship_cfg(compute_dtype="bfloat16", period_buckets=buckets)
        out = _measure(cfg, 256)
        print(json.dumps({"cell": "buckets_flagship", "period_buckets": buckets, **out}),
              flush=True)


def buckets_l512():
    from __graft_entry__ import _flagship_cfg

    for buckets in (None, "auto"):
        cfg = _flagship_cfg(
            input_len=512, pred_len=24, d_ff=256, k_periods=4,
            kernel_set=((3, 3), (5, 5)), compute_dtype="bfloat16",
            min_period_threshold=2, period_buckets=buckets,
        )
        out = _measure(cfg, 64, n1=4, n2=12)
        print(json.dumps({"cell": "buckets_l512", "period_buckets": buckets, **out}),
              flush=True)


def batch_curve():
    # tap-stack threshold is bound at ops.fold import -> fresh process per value
    for thresh in ("default", str(4 << 30)):
        env = dict(os.environ)
        if thresh != "default":
            env["FLOW_TIMESNET_TAP_STACK_BYTES"] = thresh
        else:
            env.pop("FLOW_TIMESNET_TAP_STACK_BYTES", None)
        code = (
            "import sys, json; sys.path.insert(0, '.');\n"
            "from __graft_entry__ import _flagship_cfg\n"
            "from tools.ab_flagship import _measure\n"
            "for b in (256, 512, 1024):\n"
            "    cfg = _flagship_cfg(compute_dtype='bfloat16')\n"
            "    out = _measure(cfg, b, n1=4, n2=12)\n"
            f"    print(json.dumps({{'cell': 'batch_curve', 'thresh': '{thresh}', 'batch': b, **out}}), flush=True)\n"
        )
        subprocess.run([sys.executable, "-c", code], env=env, check=True,
                       cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


if __name__ == "__main__":
    cells = sys.argv[1:] or ["buckets_flagship", "buckets_l512", "batch_curve"]
    for cell in cells:
        globals()[cell]()
