"""Seasonal-naive baseline submissions for the demand benchmark.

Builds a wide ``row_key`` submission from each TEST file's 28-day history
only (no access to the simulator), for context rows in BENCHMARKS.md:

- ``snaive``: the value observed 7 days before the target day (last week's
  same weekday).
- ``weekly_mean``: the mean of the four same-weekday values in the history.

Usage: python tools/naive_baseline.py DATA_DIR OUT.csv [--method weekly_mean]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from make_demand_benchmark import (  # noqa: E402
    DATE_COL,
    HORIZON,
    ID_COL,
    TARGET_COL,
    TEST_FILES,
    TEST_HISTORY,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("data_dir")
    ap.add_argument("out_csv")
    ap.add_argument("--method", choices=["snaive", "weekly_mean"],
                    default="weekly_mean")
    args = ap.parse_args()

    sample = pd.read_csv(
        os.path.join(args.data_dir, "sample_submission.csv"), encoding="utf-8-sig"
    )
    ids = list(sample.columns[1:])
    out = sample.copy()
    out[ids] = out[ids].astype(float)

    for i in range(TEST_FILES):
        t = pd.read_csv(
            os.path.join(args.data_dir, "test", f"TEST_{i:02d}.csv"),
            encoding="utf-8-sig",
        )
        wide = (
            t.pivot_table(index=DATE_COL, columns=ID_COL, values=TARGET_COL,
                          aggfunc="sum")
            .reindex(columns=ids)
        )
        wide.index = pd.to_datetime(wide.index)
        full_idx = pd.date_range(wide.index.min(), periods=TEST_HISTORY, freq="D")
        wide = wide.reindex(full_idx)  # missing rows -> NaN, handled below
        hist = wide.to_numpy(float)  # [28, N]
        for d in range(HORIZON):
            # target day is history day 28+d; same weekday slots in history:
            slots = np.arange(TEST_HISTORY + d - 7, -1, -7)[::-1]
            vals = hist[slots]  # [n_slots, N]
            if args.method == "snaive":
                pred = vals[-1]
                pred = np.where(np.isnan(pred), np.nanmean(vals, axis=0), pred)
            else:
                pred = np.nanmean(vals, axis=0)
            pred = np.nan_to_num(pred, nan=0.0)
            row_key = f"TEST_{i:02d}+D{d + 1}"
            out.loc[out[sample.columns[0]] == row_key, ids] = pred

    out.to_csv(args.out_csv, index=False, encoding="utf-8-sig")
    print(f"wrote {args.out_csv} ({args.method})")


if __name__ == "__main__":
    main()
