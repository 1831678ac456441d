"""Host-side data-loading bench: native C++ CSV->pivot vs the pandas path.

Generates a Korean-schema long CSV (T days x N series, integer demand
counts, unicode ids) and times three pipelines end-to-end to the wide
[T, N] frame:
  * native  — runtime/csv_pivot.cpp one-pass parse + dictionary pivot
  * pandas+numpy — pd.read_csv + the vectorized factorize/scatter pivot
  * pandas+pivot — pd.read_csv + DataFrame.pivot (the reference's approach,
    /root/reference/src/timesnet_forecast/utils/io.py:494-570)

Usage: python tools/bench_csv_pivot.py [--days 900] [--series 2000]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--days", type=int, default=900)
    ap.add_argument("--series", type=int, default=2000)
    args = ap.parse_args()

    from flow_timesnet_tpu.data.pivot import (
        _native_read_long_pivot,
        pivot_long_to_wide,
    )

    rng = np.random.default_rng(0)
    T, N = args.days, args.series
    days = pd.date_range("2021-01-01", periods=T, freq="D").strftime("%Y-%m-%d")
    ids = [f"store {i // 100}_메뉴 아이템 {i % 100}" for i in range(N)]
    path = os.path.join(tempfile.gettempdir(), "bench_long.csv")
    with open(path, "w", encoding="utf-8") as f:
        f.write("date,id,target\n")
        for d in days:
            vals = rng.integers(0, 99, N)
            f.write("".join(f"{d},{ids[j]},{vals[j]}\n" for j in range(N)))
    size_mb = os.path.getsize(path) / 1e6

    def best(fn, reps=3):
        b = float("inf")
        out = None
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            b = min(b, time.perf_counter() - t0)
        return b, out

    t_native, native = best(
        lambda: _native_read_long_pivot(path, "date", "id", "target", True, "utf-8")
    )
    t_pd, df = best(lambda: pd.read_csv(path), reps=1)
    t_np_pivot, ref = best(
        lambda: pivot_long_to_wide(df, date_col="date", id_col="id", target_col="target"),
        reps=1,
    )
    t_pd_pivot, _ = best(
        lambda: df.pivot(index="date", columns="id", values="target"), reps=1
    )

    ok = native is not None and list(native.columns) == list(ref.columns)
    if ok:
        np.testing.assert_allclose(
            native.fillna(0.0).to_numpy(float), ref.to_numpy(float)
        )
    print(json.dumps({
        "rows": T * N,
        "size_mb": round(size_mb, 1),
        "native_s": round(t_native, 3),
        "pandas_read_plus_numpy_pivot_s": round(t_pd + t_np_pivot, 3),
        "pandas_read_plus_df_pivot_s": round(t_pd + t_pd_pivot, 3),
        "speedup_vs_numpy_pivot": round((t_pd + t_np_pivot) / t_native, 1),
        "speedup_vs_reference_style": round((t_pd + t_pd_pivot) / t_native, 1),
        "mb_per_s_native": round(size_mb / t_native, 1),
        "parity": bool(ok),
    }))
    os.remove(path)


if __name__ == "__main__":
    main()
