"""Long-context benchmark generator + scorer sanity (VERDICT r3 #7 tooling).

Mirrors tests/test_demand_benchmark_gen.py for the hourly benchmark behind
configs/long_context.yaml: the generator's file contracts, and the scorer's
truth extraction / submission loading / oracle ordering.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
)

from make_long_context_benchmark import (  # noqa: E402
    HORIZON,
    TEST_FILES,
    TEST_HISTORY,
    write_benchmark,
)

N_SERIES = 6
T_TRAIN = 700


def test_generator_contracts(tmp_path):
    out = str(tmp_path / "lc")
    write_benchmark(out, seed=5, n_series=N_SERIES, t_train=T_TRAIN)

    train = pd.read_csv(os.path.join(out, "train.csv"), encoding="utf-8-sig")
    assert list(train.columns) == ["date", "id", "target"]
    assert train["id"].nunique() == N_SERIES
    # hourly grid: consecutive timestamps one hour apart
    stamps = pd.to_datetime(train["date"]).sort_values().unique()
    assert (pd.Series(stamps).diff().dropna() == pd.Timedelta(hours=1)).all()
    # ~1% missingness: fewer rows than the dense grid
    assert len(train) < T_TRAIN * N_SERIES

    for i in range(TEST_FILES):
        t = pd.read_csv(os.path.join(out, "test", f"TEST_{i:02d}.csv"),
                        encoding="utf-8-sig")
        assert t["date"].nunique() <= TEST_HISTORY

    sample = pd.read_csv(os.path.join(out, "sample_submission.csv"),
                         encoding="utf-8-sig")
    assert sample.shape == (TEST_FILES * HORIZON, 1 + N_SERIES)
    assert sample.iloc[0, 0] == "TEST_00+D1"

    mu = np.load(os.path.join(out, "latent_mu.npy"))
    assert mu.shape == (T_TRAIN + TEST_FILES * HORIZON + TEST_HISTORY, N_SERIES)
    assert (mu > 0).all()


def test_scorer(tmp_path):
    from score_lc_submission import load_submission, truth_frame

    truth = truth_frame(5, N_SERIES, T_TRAIN)
    assert truth.shape == (TEST_FILES * HORIZON, N_SERIES)
    assert list(truth.index)[:2] == ["TEST_00+D1", "TEST_00+D2"]
    assert (truth.to_numpy() >= 0).all()

    from flow_timesnet_tpu.utils.metrics import smape_mean

    # oracle (conditional mean) beats the zero forecast
    oracle = truth_frame(5, N_SERIES, T_TRAIN, use_expected=True)
    s_oracle = smape_mean(truth.to_numpy(float), oracle.to_numpy(float))
    s_zero = smape_mean(truth.to_numpy(float), truth.to_numpy(float) * 0.0)
    assert 0.0 < s_oracle < s_zero

    # row-key and timestamp-keyed submissions load onto the same rows
    p = tmp_path / "sub.csv"
    wide = truth.reset_index().rename(columns={"index": "date"})
    wide.to_csv(p, index=False, encoding="utf-8-sig")
    assert np.allclose(load_submission(str(p), truth).to_numpy(), truth.to_numpy())

    dated = wide.copy()
    dated["date"] = [truth.attrs["date_of_key"][k] for k in truth.index]
    dated.to_csv(p, index=False, encoding="utf-8-sig")
    assert np.allclose(load_submission(str(p), truth).to_numpy(), truth.to_numpy())
