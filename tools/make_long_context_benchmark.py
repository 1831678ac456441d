"""Generate a reproducible LONG-CONTEXT benchmark dataset (hourly counts).

VERDICT r3 #7: the L=512 recipe only ever had synthetic step-time numbers.
This generator produces an hourly NB-count dataset with genuine multi-scale
structure — daily (24) and weekly (168) cycles, slow level drift, burst
events — so `configs/long_context.yaml` can be trained end-to-end and the
`period_buckets` ladder A/B'd for QUALITY (the caps change which periods
fold, exactly the class of knob the flagship `period_cap` A/B showed can
cost sMAPE).

Schema matches configs/long_context.yaml: long format, date/id/target
columns, hourly timestamps; TEST files carry 512h history each; the sample
submission uses row keys TEST_xx+D1..D24 (one per horizon hour).

Usage: python tools/make_long_context_benchmark.py OUTDIR [--seed 5]
       [--series 48] [--hours 2400]
"""

from __future__ import annotations

import argparse
import math
import os

import numpy as np
import pandas as pd

TEST_FILES = 2
TEST_HISTORY = 512
HORIZON = 24


def simulate(seed: int, n_series: int, t_train: int):
    rng = np.random.default_rng(seed)
    total = t_train + TEST_FILES * HORIZON + TEST_HISTORY
    dates = pd.date_range("2024-01-01", periods=total, freq="h")
    t = np.arange(total)
    hour = np.asarray(dates.hour)
    dow = np.asarray(dates.dayofweek)

    base = rng.lognormal(mean=1.6, sigma=0.7, size=n_series)
    # daily profile: evening-peaked or morning-peaked per series
    daily_phase = rng.uniform(0, 2 * math.pi, n_series)
    daily_amp = rng.uniform(0.4, 0.9, n_series)
    weekly_amp = rng.uniform(0.1, 0.5, n_series)
    weekend_sign = np.where(rng.random(n_series) < 0.5, 1.0, -1.0)
    drift = rng.normal(0.0, 5e-5, n_series)
    alpha = rng.uniform(0.1, 0.45, n_series)

    mu = np.empty((total, n_series))
    for j in range(n_series):
        daily = 1.0 + daily_amp[j] * np.sin(2 * math.pi * hour / 24.0 + daily_phase[j])
        weekend = (dow >= 5).astype(np.float64)
        weekly = 1.0 + weekly_amp[j] * weekend_sign[j] * (weekend - 2.0 / 7.0)
        level = base[j] * np.exp(drift[j] * t)
        mu[:, j] = np.maximum(level * daily * weekly, 0.05)

    # burst events: 6-36h demand surges
    n_events = max(4, n_series // 2)
    for _ in range(n_events):
        j = rng.integers(0, n_series)
        start = rng.integers(0, total - 36)
        dur = int(rng.integers(6, 37))
        mu[start : start + dur, j] *= rng.uniform(1.8, 3.5)

    shape = 1.0 / alpha[None, :]
    lam = rng.gamma(shape, mu * alpha[None, :])
    demand = rng.poisson(lam).astype(np.float64)
    observed = rng.random((total, n_series)) >= 0.01
    return dates, demand, observed, mu, alpha


def write_benchmark(outdir: str, seed: int, n_series: int, t_train: int) -> None:
    dates, demand, observed, mu, alpha = simulate(seed, n_series, t_train)
    ids = [f"S{j:03d}" for j in range(n_series)]
    os.makedirs(os.path.join(outdir, "test"), exist_ok=True)

    def to_long(d0: int, d1: int) -> pd.DataFrame:
        rows = []
        for j, sid in enumerate(ids):
            sel = np.arange(d0, d1)[observed[d0:d1, j]]
            rows.append(
                pd.DataFrame(
                    {
                        "date": dates[sel].strftime("%Y-%m-%d %H:%M:%S"),
                        "id": sid,
                        "target": demand[sel, j].astype(int),
                    }
                )
            )
        out = pd.concat(rows, ignore_index=True)
        return out.sort_values(["date", "id"], kind="stable").reset_index(drop=True)

    to_long(0, t_train).to_csv(os.path.join(outdir, "train.csv"), index=False)

    row_keys = []
    for i in range(TEST_FILES):
        start = t_train + i * HORIZON
        end = start + TEST_HISTORY
        to_long(start, end).to_csv(
            os.path.join(outdir, "test", f"TEST_{i:02d}.csv"), index=False
        )
        row_keys.extend(f"TEST_{i:02d}+D{d}" for d in range(1, HORIZON + 1))

    sample = pd.concat(
        [pd.DataFrame({"date": row_keys})]
        + [pd.Series(0, index=range(len(row_keys)), name=sid) for sid in ids],
        axis=1,
    )
    sample.to_csv(os.path.join(outdir, "sample_submission.csv"), index=False)

    # latent truth for oracle scoring (NB2 mean/dispersion per future cell)
    np.save(os.path.join(outdir, "latent_mu.npy"), mu)
    np.save(os.path.join(outdir, "latent_alpha.npy"), alpha)
    print(
        f"wrote {outdir}: train.csv ({t_train}h x {n_series} series), "
        f"{TEST_FILES} TEST files (512h history each), sample_submission.csv"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--seed", type=int, default=5)
    ap.add_argument("--series", type=int, default=48)
    ap.add_argument("--hours", type=int, default=2400)
    args = ap.parse_args()
    write_benchmark(args.outdir, args.seed, args.series, args.hours)


if __name__ == "__main__":
    main()
