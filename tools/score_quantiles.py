"""Score quantile submissions: empirical coverage + pinball loss + oracle floor.

Companion to ``score_submission.py`` for the interval files that
``predict.quantiles`` writes (``<sub>.q10.csv`` etc.). For each level q it
reports:

- ``coverage``: empirical P(y_true <= q-hat) over all TEST future cells —
  calibrated forecasts land near q itself;
- ``pinball``: mean pinball (quantile) loss, the proper scoring rule for
  quantiles — lower is better, and the *true* predictive distribution's
  quantiles minimise it in expectation.

``--oracle`` computes the exact quantiles of the generator's per-cell
predictive distribution (NB2 with the latent mu/alpha, zero-inflated at
0.55 for intermittent series, degenerate 0 on closure days) and scores
those instead: the coverage validates the metric (it must sit near nominal
up to NB discreteness, which over-covers) and the pinball numbers are the
irreducible floor for each level.

Usage:
    python tools/score_quantiles.py SUBMISSION.csv --levels 0.1 0.5 0.9
    python tools/score_quantiles.py --oracle --levels 0.1 0.5 0.9

Prints one JSON line per level plus an interval-coverage summary for the
outermost symmetric pair.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from make_demand_benchmark import (  # noqa: E402
    HORIZON,
    T_TRAIN,
    TEST_FILES,
    TEST_HISTORY,
    simulate,
)
from score_submission import load_submission, truth_frame  # noqa: E402

from flow_timesnet_tpu.utils.quantiles import nb2_ppf, quantile_out_path  # noqa: E402

ZERO_INFLATION = 0.55  # intermittent series: P(forced zero), generator line


def _future_rows():
    """Row indices of every TEST future day in simulation time order."""

    rows = []
    for i in range(TEST_FILES):
        future0 = T_TRAIN + i * HORIZON + TEST_HISTORY
        rows.extend(range(future0, future0 + HORIZON))
    return np.asarray(rows)


def oracle_quantiles(seed: int, levels) -> dict:
    """{q: [rows, N] exact quantiles of the generator's predictive law}."""

    _, ids, _, _, _, params = simulate(seed, return_params=True)
    rows = _future_rows()
    mu = params["mu"][rows]  # [R, N]
    alpha = np.broadcast_to(params["alpha"][None, :], mu.shape)
    inter = params["intermittent"]
    closed = params["closed"][rows]
    out = {}
    for q in levels:
        vals = nb2_ppf(q, mu, alpha)
        if inter.any():
            # zero-inflated mixture: F(k) = zi + (1-zi) F_NB(k) for k >= 0
            q_adj = (q - ZERO_INFLATION) / (1.0 - ZERO_INFLATION)
            if q_adj <= 0.0:
                vals[:, inter] = 0.0
            else:
                vals[:, inter] = nb2_ppf(q_adj, mu[:, inter], alpha[:, inter])
        vals[closed] = 0.0
        out[float(q)] = vals
    return out, ids


def pinball(y, yhat, q):
    d = y - yhat
    return float(np.mean(np.maximum(q * d, (q - 1.0) * d)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("submission", nargs="?", default=None,
                    help="the MEAN submission path; quantile files are "
                         "resolved next to it (<sub>.q10.csv, ...)")
    ap.add_argument("--levels", type=float, nargs="+", default=[0.1, 0.5, 0.9])
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--label", default=None)
    ap.add_argument("--oracle", action="store_true",
                    help="score the generator's exact predictive quantiles")
    args = ap.parse_args()

    levels = sorted(set(args.levels))
    truth = truth_frame(args.seed)
    y_true = truth.to_numpy(float)

    results = {}
    if args.oracle:
        label = "oracle_predictive_quantiles"
        oq, ids = oracle_quantiles(args.seed, levels)
        assert list(ids) == list(truth.columns)
        for q in levels:
            results[q] = oq[q]
    else:
        if args.submission is None:
            ap.error("submission path required unless --oracle")
        label = os.path.basename(args.submission)
        for q in levels:
            qpath = quantile_out_path(args.submission, q)
            sub = load_submission(qpath, truth)
            results[q] = sub[truth.columns].to_numpy(float)

    label = args.label or label
    for q in levels:
        yq = results[q]
        print(json.dumps({
            "label": label,
            "level": q,
            "coverage": round(float(np.mean(y_true <= yq)), 4),
            "pinball": round(pinball(y_true, yq, q), 4),
            "n_cells": int(y_true.size),
        }, ensure_ascii=False))
    lo, hi = levels[0], levels[-1]
    if lo < 0.5 < hi:
        inside = (y_true >= results[lo]) & (y_true <= results[hi])
        print(json.dumps({
            "label": label,
            "interval": [lo, hi],
            "nominal": round(hi - lo, 4),
            "empirical_coverage": round(float(np.mean(inside)), 4),
        }, ensure_ascii=False))


if __name__ == "__main__":
    main()
