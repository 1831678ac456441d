"""Filter a demand-benchmark data dir down to its first S stores.

The full 192-series benchmark is too large to train the PyTorch reference on
this host's single CPU core in reasonable time, so the head-to-head quality
comparison (BENCHMARKS.md) runs both frameworks on a store subset; the
scorer (``tools/score_submission.py``) scores whatever series columns a
submission carries, so subset submissions score directly.

Usage: python tools/make_subset.py SRC_DIR DST_DIR [--stores 2]
"""

from __future__ import annotations

import argparse
import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from make_demand_benchmark import DATE_COL, ID_COL, TEST_FILES  # noqa: E402


def _keep(df: pd.DataFrame, stores: set) -> pd.DataFrame:
    return df[df[ID_COL].str.split("_", n=1).str[0].isin(stores)].reset_index(
        drop=True
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--stores", type=int, default=2)
    args = ap.parse_args()

    os.makedirs(os.path.join(args.dst, "test"), exist_ok=True)
    train = pd.read_csv(os.path.join(args.src, "train.csv"), encoding="utf-8-sig")
    all_stores = sorted(train[ID_COL].str.split("_", n=1).str[0].unique())
    keep = set(all_stores[: args.stores])

    _keep(train, keep).to_csv(
        os.path.join(args.dst, "train.csv"), index=False, encoding="utf-8-sig"
    )
    for i in range(TEST_FILES):
        name = os.path.join("test", f"TEST_{i:02d}.csv")
        t = pd.read_csv(os.path.join(args.src, name), encoding="utf-8-sig")
        _keep(t, keep).to_csv(
            os.path.join(args.dst, name), index=False, encoding="utf-8-sig"
        )
    sample = pd.read_csv(
        os.path.join(args.src, "sample_submission.csv"), encoding="utf-8-sig"
    )
    cols = [sample.columns[0]] + [
        c for c in sample.columns[1:] if c.split("_", 1)[0] in keep
    ]
    sample[cols].to_csv(
        os.path.join(args.dst, "sample_submission.csv"),
        index=False,
        encoding="utf-8-sig",
    )
    n = len(cols) - 1
    print(f"wrote {args.dst}: stores={sorted(keep)} ({n} series)")


if __name__ == "__main__":
    main()
