"""Score a long-context-benchmark submission against the generator's truth.

Counterpart of ``tools/score_submission.py`` for the hourly long-context
benchmark (``tools/make_long_context_benchmark.py``). The generator simulates
the full timeline, so the 24h future of every TEST window is known exactly;
``--oracle`` scores the simulator's conditional mean (the latent NB2 ``mu``)
as a submission — the irreducible-noise floor.

Usage:
    python tools/score_lc_submission.py SUBMISSION.csv [--seed 5] [--label x]
    python tools/score_lc_submission.py --oracle

Prints one JSON line: {"label", "smape", "wsmape", "n_rows", "n_series"}.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from make_long_context_benchmark import (  # noqa: E402
    HORIZON,
    TEST_FILES,
    TEST_HISTORY,
    simulate,
)

from flow_timesnet_tpu.utils.metrics import smape_mean, wsmape_grouped  # noqa: E402

_ROW_KEY = re.compile(r"^(TEST_\d+)\+D(\d+)$")


def truth_frame(seed: int, n_series: int, t_train: int,
                use_expected: bool = False) -> pd.DataFrame:
    """Ground-truth demand for every TEST future hour, indexed by row key."""

    dates, demand, _, mu, _ = simulate(seed, n_series, t_train)
    values = mu if use_expected else demand
    ids = [f"S{j:03d}" for j in range(n_series)]
    keys, rows, key_dates = [], [], []
    for i in range(TEST_FILES):
        future0 = t_train + i * HORIZON + TEST_HISTORY
        for d in range(HORIZON):
            keys.append(f"TEST_{i:02d}+D{d + 1}")
            key_dates.append(dates[future0 + d].strftime("%Y-%m-%d %H:%M:%S"))
            rows.append(values[future0 + d])
    df = pd.DataFrame(np.asarray(rows), index=keys, columns=ids)
    df.attrs["date_of_key"] = dict(zip(keys, key_dates))
    return df


def load_submission(path: str, truth: pd.DataFrame) -> pd.DataFrame:
    sub = pd.read_csv(path, encoding="utf-8-sig")
    sub = sub.set_index(sub.columns[0])
    idx = [str(v) for v in sub.index]
    if all(_ROW_KEY.match(v) for v in idx):
        sub.index = idx
    else:
        date_to_key = {d: k for k, d in truth.attrs["date_of_key"].items()}
        mapped = []
        for v in idx:
            d = str(pd.Timestamp(v))
            if d not in date_to_key:
                raise ValueError(f"submission date {v!r} is not a TEST future hour")
            mapped.append(date_to_key[d])
        sub.index = mapped
    missing = [k for k in truth.index if k not in sub.index]
    if missing:
        raise ValueError(f"submission is missing rows: {missing[:5]} ...")
    cols = [c for c in truth.columns if c in sub.columns]
    if not cols:
        raise ValueError("submission shares no series columns with the benchmark")
    return sub.loc[truth.index, cols].astype(float)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("submission", nargs="?", default=None)
    ap.add_argument("--seed", type=int, default=5)
    ap.add_argument("--series", type=int, default=48)
    ap.add_argument("--hours", type=int, default=2400)
    ap.add_argument("--label", default=None)
    ap.add_argument("--oracle", action="store_true",
                    help="score the simulator's conditional mean (noise floor)")
    args = ap.parse_args()
    truth = truth_frame(args.seed, args.series, args.hours)
    if args.oracle:
        sub = truth_frame(args.seed, args.series, args.hours, use_expected=True)
        label = "oracle_conditional_mean"
    else:
        if args.submission is None:
            ap.error("submission path required unless --oracle")
        sub = load_submission(args.submission, truth)
        label = os.path.basename(os.path.dirname(args.submission) or args.submission)
    cols = list(sub.columns)
    y_true = truth[cols].to_numpy(float)
    y_pred = sub.to_numpy(float)
    out = {
        "label": args.label or label,
        "smape": round(smape_mean(y_true, y_pred), 6),
        "wsmape": round(wsmape_grouped(y_true, y_pred, cols), 6),
        "n_rows": int(y_true.shape[0]),
        "n_series": int(y_true.shape[1]),
    }
    print(json.dumps(out, ensure_ascii=False))


if __name__ == "__main__":
    main()
