"""Score a demand-benchmark submission against the generator's ground truth.

The benchmark generator (``tools/make_demand_benchmark.py``) simulates the
full timeline, so the 7-day future of every TEST window is known exactly.
This scorer regenerates the simulation for the given seed, extracts the true
demand for each ``TEST_xx+D1..D7`` row, and scores a wide submission CSV with
the same metric semantics as the pipeline (``utils/metrics.py``, mirroring
the reference's ``utils/metrics.py``): overall sMAPE over non-zero actuals,
and store-grouped wSMAPE (store key = ``id.split('_', 1)[0]``).

Accepts both writer layouts (the first column may be ``TEST_xx+Dk`` row keys
or actual forecast dates) so submissions from this framework and from the
PyTorch reference score identically.

Usage:
    python tools/score_submission.py SUBMISSION.csv [--seed 7] [--label name]

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

from make_demand_benchmark import (  # noqa: E402
    HORIZON,
    T_TRAIN,
    TEST_FILES,
    TEST_HISTORY,
    simulate,
)

from flow_timesnet_tpu.utils.metrics import smape_mean, wsmape_grouped  # noqa: E402

_ROW_KEY = re.compile(r"^(TEST_\d+)\+D(\d+)$")


def truth_frame(seed: int, use_expected: bool = False, *,
                n_stores: int | None = None, n_menus: int | None = None,
                t_train: int | None = None) -> pd.DataFrame:
    """Ground-truth demand for every TEST future day, indexed by row key.

    ``use_expected`` returns the simulator's conditional expectation instead —
    scoring it as a submission gives the irreducible-noise floor (no
    forecaster can beat the true mean on NB-sampled counts, in expectation).
    ``n_stores``/``n_menus``/``t_train`` re-simulate non-default dataset
    shapes (e.g. the 10k-series high-cardinality benchmark: 100x100, 200 days).
    """

    sim_kwargs = {}
    if n_stores is not None:
        sim_kwargs["n_stores"] = n_stores
    if n_menus is not None:
        sim_kwargs["n_menus"] = n_menus
    t_train = T_TRAIN if t_train is None else int(t_train)
    if t_train != T_TRAIN:
        sim_kwargs["t_train"] = t_train
    dates, ids, demand, _, expected = simulate(seed, **sim_kwargs)
    values = expected if use_expected else demand
    keys, rows, key_dates = [], [], []
    for i in range(TEST_FILES):
        future0 = t_train + i * HORIZON + TEST_HISTORY
        for d in range(HORIZON):
            keys.append(f"TEST_{i:02d}+D{d + 1}")
            key_dates.append(dates[future0 + d].strftime("%Y-%m-%d"))
            rows.append(values[future0 + d])
    df = pd.DataFrame(np.asarray(rows), index=keys, columns=ids)
    df.attrs["date_of_key"] = dict(zip(keys, key_dates))
    return df


def load_submission(path: str, truth: pd.DataFrame) -> pd.DataFrame:
    """Read a wide submission; normalise its index to TEST row keys."""

    sub = pd.read_csv(path, encoding="utf-8-sig")
    first = sub.columns[0]
    sub = sub.set_index(first)
    idx = [str(v) for v in sub.index]
    if all(_ROW_KEY.match(v) for v in idx):
        sub.index = idx
    else:
        # date-keyed layout: map forecast dates back to row keys
        date_to_key = {d: k for k, d in truth.attrs["date_of_key"].items()}
        mapped = []
        for v in idx:
            d = str(pd.Timestamp(v).date())
            if d not in date_to_key:
                raise ValueError(f"submission date {v!r} is not a TEST future day")
            mapped.append(date_to_key[d])
        sub.index = mapped
    missing_rows = [k for k in truth.index if k not in sub.index]
    if missing_rows:
        raise ValueError(f"submission is missing rows: {missing_rows[:5]} ...")
    cols = [c for c in truth.columns if c in sub.columns]
    if not cols:
        raise ValueError("submission shares no series columns with the benchmark")
    return sub.loc[truth.index, cols].astype(float)


def score(sub: pd.DataFrame, truth: pd.DataFrame) -> dict:
    cols = list(sub.columns)
    y_true = truth[cols].to_numpy(float)
    y_pred = sub.to_numpy(float)
    return {
        "smape": round(smape_mean(y_true, y_pred), 6),
        "wsmape": round(wsmape_grouped(y_true, y_pred, cols), 6),
        "n_rows": int(y_true.shape[0]),
        "n_series": int(y_true.shape[1]),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("submission", nargs="?", default=None)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--label", default=None)
    ap.add_argument("--stores", type=int, default=None,
                    help="re-simulate with this many stores (HC benchmark: 100)")
    ap.add_argument("--menus", type=int, default=None,
                    help="re-simulate with this many menus (HC benchmark: 100)")
    ap.add_argument("--days", type=int, default=None,
                    help="re-simulate with this training length (HC: 200)")
    ap.add_argument("--oracle", action="store_true",
                    help="score the simulator's conditional mean (noise floor)")
    args = ap.parse_args()
    shape = dict(n_stores=args.stores, n_menus=args.menus, t_train=args.days)
    truth = truth_frame(args.seed, **shape)
    if args.oracle:
        sub = truth_frame(args.seed, use_expected=True, **shape)
        label = "oracle_conditional_mean"
    else:
        if args.submission is None:
            ap.error("submission path required unless --oracle")
        sub = load_submission(args.submission, truth)
        label = os.path.basename(args.submission)
    out = {"label": args.label or label}
    out.update(score(sub, truth))
    print(json.dumps(out, ensure_ascii=False))


if __name__ == "__main__":
    main()
