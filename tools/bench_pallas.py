"""On-chip Pallas-vs-XLA fold-conv comparison (VERDICT r1 #7).

Times the two tap-conv backends (``ops.fold.tap_conv`` — the XLA
masked-dilated-tap formulation — and ``ops.pallas_fold.tap_conv_pallas``)
forward-only at flagship and long-context shapes. Timing is the two-length
scan slope terminated by a scalar value fetch, so constant relay dispatch
round-trips cancel (STATUS.md "Environment caveats").

Usage: python tools/bench_pallas.py [--dtype bfloat16] [--csv]
Prints one JSON line per (shape, backend).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_case(name, K, B, L, C, kh, kw, dtype, n1=6, n2=24):
    import jax
    import jax.numpy as jnp

    from flow_timesnet_tpu.ops.fold import make_geometry, pad_time, tap_conv
    from flow_timesnet_tpu.ops.pallas_fold import tap_conv_pallas

    rng = np.random.default_rng(0)
    p_cap = L - 1
    # realistic period spread for the shape (weekly-ish through long)
    periods = np.linspace(max(2, L // 64), p_cap, K).astype(np.int32)
    geom = make_geometry(jnp.asarray(periods), L, p_cap=p_cap)
    x = jnp.asarray(rng.standard_normal((B, L, C)), dtype)
    h = jnp.broadcast_to(pad_time(x, L, geom.Lp)[None], (K, B, geom.Lp, C))
    kernel = jnp.asarray(rng.standard_normal((kh, kw, C, C)) * 0.1, jnp.float32)
    bias = jnp.zeros((C,), jnp.float32)

    results = {}
    for backend, fn in (
        ("xla", lambda hh: tap_conv(hh, geom, kernel, bias, kh, kw)),
        ("pallas", lambda hh: tap_conv_pallas(hh, geom, kernel, bias, kh, kw)),
    ):
        def chained(h0, steps):
            # Python-loop chaining (unrolled in the jitted program): a
            # pallas_call inside lax.scan crashes the relay's remote Mosaic
            # compile helper, and the data dependency is all the timing needs.
            out = h0
            for _ in range(steps):
                out = fn(out).astype(dtype)
            return out

        try:
            run = {
                n: jax.jit(lambda h0, n=n: chained(h0, n)) for n in (n1, n2)
            }

            def timed(n):
                t0 = time.perf_counter()
                out = run[n](h)
                _ = float(out.sum())
                return time.perf_counter() - t0

            timed(n1)
            timed(n2)
            best = float("inf")
            for _ in range(3):
                best = min(best, max((timed(n2) - timed(n1)) / (n2 - n1), 1e-9))
            flops = 2 * K * B * geom.Lp * kh * kw * C * C
            results[backend] = {
                "ms_per_call": round(best * 1e3, 4),
                "tflops": round(flops / best / 1e12, 2),
            }
        except Exception as e:  # noqa: BLE001
            results[backend] = {"error": str(e)[:160]}

    line = {
        "case": name,
        "shape": f"K{K} B{B} L{L} C{C} {kh}x{kw} {dtype}",
        **{f"{k}_{m}": v for k, r in results.items() for m, v in r.items()},
    }
    if "ms_per_call" in results.get("xla", {}) and "ms_per_call" in results.get(
        "pallas", {}
    ):
        line["pallas_over_xla"] = round(
            results["pallas"]["ms_per_call"] / results["xla"]["ms_per_call"], 2
        )
    print(json.dumps(line))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax

    cache_dir = os.path.expanduser("~/.cache/flow_timesnet_tpu/jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(json.dumps({"device": getattr(jax.devices()[0], "device_kind", "?")}))

    dt = args.dtype
    # flagship mid-conv shape (demand recipe) and long-context shapes
    bench_case("flagship_L28", K=2, B=256, L=28, C=32, kh=7, kw=7, dtype=dt)
    bench_case("long_L512", K=4, B=64, L=512, C=32, kh=5, kw=5, dtype=dt)
    bench_case("long_L512_wide", K=4, B=64, L=512, C=64, kh=5, kw=5, dtype=dt)


if __name__ == "__main__":
    main()
