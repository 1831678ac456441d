"""Root-cause diagnostics for the head-to-head quality gap (VERDICT r2 #3).

Reproduces the analysis summarized in STATUS.md / BENCHMARKS.md: WHERE does
the PyTorch reference lose test sMAPE relative to this framework, given that
both train to near-identical validation NLL? For a pair of submissions on
the 48-series subset it reports:

  1. per-series sMAPE for both, and the correlation between series volume
     (mean true demand over the scored rows) and the ref-minus-ours
     per-series sMAPE delta — negative means the deficit concentrates on
     low-volume series;
  2. near-zero predictions (pred < 0.5) on cells with positive actuals:
     count and mean cell sMAPE for each framework — sMAPE assigns ~2.0 to a
     near-zero prediction against any positive actual, so these cells are
     where the score is lost;
  3. an id-permutation check: for each framework, the fraction of series
     whose prediction column best-matches (min sMAPE) its OWN truth column —
     ~1.0 rules out column misalignment as the cause;
  4. volume-calibration slopes (lstsq of predicted on true cell values) —
     matching slopes rule out a global scale error.

Usage:
    python tools/analyze_head_to_head.py \
        [--ours outputs/ours_subset/submission.csv] \
        [--reference outputs/reference_subset/submission.csv] [--seed 7]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from score_submission import load_submission, truth_frame  # noqa: E402


def cell_smape(y_true: np.ndarray, y_pred: np.ndarray) -> np.ndarray:
    """Per-cell sMAPE on nonzero-actual cells (NaN elsewhere), ref semantics."""

    out = np.full(y_true.shape, np.nan)
    nz = y_true != 0
    denom = np.abs(y_true[nz]) + np.abs(y_pred[nz])
    out[nz] = np.where(denom > 0, 2.0 * np.abs(y_pred[nz] - y_true[nz]) / denom, 0.0)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ours", default="outputs/ours_subset/submission.csv")
    ap.add_argument("--reference", default="outputs/reference_subset/submission.csv")
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--near-zero", type=float, default=0.5)
    args = ap.parse_args()

    truth = truth_frame(args.seed)
    ours = load_submission(args.ours, truth)
    ref = load_submission(args.reference, truth)
    cols = [c for c in truth.columns if c in ours.columns and c in ref.columns]
    t = truth[cols].to_numpy(float)
    o = ours[cols].to_numpy(float)
    r = ref[cols].to_numpy(float)

    so, sr = cell_smape(t, o), cell_smape(t, r)
    report: dict = {
        "n_series": len(cols),
        "cell_smape_mean": {"ours": round(float(np.nanmean(so)), 4),
                            "reference": round(float(np.nanmean(sr)), 4)},
    }

    # 1. volume vs per-series delta
    vol = t.mean(axis=0)
    per_o = np.nanmean(so, axis=0)
    per_r = np.nanmean(sr, axis=0)
    delta = per_r - per_o
    report["volume_vs_delta_corr"] = round(float(np.corrcoef(vol, delta)[0, 1]), 3)
    report["volume_vs_delta_corr_logvol"] = round(
        float(np.corrcoef(np.log1p(vol), delta)[0, 1]), 3
    )

    # 2. near-zero predictions against positive actuals
    for name, p, s in (("ours", o, so), ("reference", r, sr)):
        m = (t > 0) & (p < args.near_zero)
        report[f"near_zero_{name}"] = {
            "count": int(m.sum()),
            "mean_cell_smape": round(float(np.nanmean(s[m])), 3) if m.any() else None,
        }

    # 3. id-permutation check: each prediction column should match its OWN
    # series best. Matching is against the simulator's conditional mean (the
    # oracle), not the NB-sampled actuals — smooth-vs-smooth, so a genuine
    # column misalignment between the writers would stand out.
    oracle = truth_frame(args.seed, use_expected=True)[cols].to_numpy(float)

    def own_best_frac(p: np.ndarray) -> float:
        d = np.abs(p[:, :, None] - oracle[:, None, :]).mean(axis=0)
        return float((d.argmin(axis=1) == np.arange(d.shape[0])).mean())

    report["own_column_best_match_frac"] = {
        "ours": round(own_best_frac(o), 3),
        "reference": round(own_best_frac(r), 3),
        "chance": round(1.0 / len(cols), 3),
    }

    # Sharper cross-framework check: our column j should best-match the
    # reference's column j (both are smooth forecasts), so a permutation in
    # either writer would push this toward chance.
    d = np.abs(o[:, :, None] - r[:, None, :]).mean(axis=0)
    report["cross_framework_same_column_frac"] = round(
        float((d.argmin(axis=1) == np.arange(d.shape[0])).mean()), 3
    )

    # 4. volume calibration: slope of per-series mean prediction on
    # per-series mean actual (through the origin) — a global scale error
    # would show up as diverging slopes.
    mt, mo, mr = t.mean(axis=0), o.mean(axis=0), r.mean(axis=0)
    report["calibration_slope_series_means"] = {
        "ours": round(float((mo * mt).sum() / (mt**2).sum()), 3),
        "reference": round(float((mr * mt).sum() / (mt**2).sum()), 3),
    }

    print(json.dumps(report, ensure_ascii=False, indent=2))


if __name__ == "__main__":
    main()
