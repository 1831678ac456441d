"""Capture an on-chip trace of the flagship train step and print top ops.

Runs a few scanned train steps under ``jax.profiler.trace``, then parses the
perfetto ``*.trace.json.gz`` directly (no tensorboard needed): aggregates
device-track event durations by op name and prints the top self-time ops.
Usage: python tools/trace_top_ops.py [--buckets auto] [--steps 8] [--top 40]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(trace_dir: str, steps: int, buckets) -> None:
    import jax
    import jax.numpy as jnp

    cache = os.path.expanduser("~/.cache/flow_timesnet_tpu/jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _flagship_cfg
    from bench import _make_engine_and_batch

    cfg = _flagship_cfg(compute_dtype="bfloat16", period_buckets=buckets)
    engine, state, dev_batch = _make_engine_and_batch(cfg, 256)
    rng = jax.random.PRNGKey(1)
    stacked = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (steps,) + x.shape) if x is not None else None,
        dev_batch,
    )
    keys = jnp.stack([jax.random.fold_in(rng, i) for i in range(steps)])
    # compile + settle outside the trace
    state, losses, _ = engine.train_steps_scanned(state, 1e-4, keys, stacked)
    _ = float(losses[-1])
    with jax.profiler.trace(trace_dir):
        state, losses, _ = engine.train_steps_scanned(state, 1e-4, keys, stacked)
        _ = float(losses[-1])


def analyze(trace_dir: str, top: int, steps: int) -> None:
    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    if not paths:
        print("no trace found under", trace_dir)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device tracks: pid names containing "TPU"/"device" XLA op lanes
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")

    device_pids = {
        pid for pid, name in pid_names.items()
        if "TPU" in name or "Device" in name or "/device" in name.lower()
    }
    agg = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        lane = tid_names.get((e["pid"], e["tid"]), "")
        if "step" in lane.lower():  # steps lane duplicates op lanes
            continue
        dur = float(e.get("dur", 0.0))
        name = e.get("name", "?")
        agg[name] += dur
        total += dur
    print(f"trace: {path}")
    print(f"device self-time total: {total/1e3:.2f} ms over {steps} steps "
          f"(~{total/1e3/steps:.2f} ms/step)\n")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{dur/1e3:9.3f} ms  {100*dur/total:5.1f}%  {name[:110]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--buckets", default=None)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--trace-dir", default="/tmp/flow_timesnet_trace")
    args = ap.parse_args()
    capture(args.trace_dir, args.steps, args.buckets)
    analyze(args.trace_dir, args.top, args.steps)


if __name__ == "__main__":
    main()
