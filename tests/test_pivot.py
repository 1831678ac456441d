"""Vectorised pivot: exact equality with DataFrame.pivot semantics."""

import numpy as np
import pandas as pd
import pytest

from torch_ref import HAS_REFERENCE

from flow_timesnet_tpu.data.pivot import (
    fit_series_scaler,
    inverse_transform,
    normalize_id,
    pivot_long_to_wide,
    transform_array,
)


def _pandas_pivot(df, date_col, id_col, target_col, fill_missing_dates, fillna0):
    out = df.copy()
    out[date_col] = pd.to_datetime(out[date_col])
    out[id_col] = out[id_col].astype(str).map(normalize_id)
    out = out[[date_col, id_col, target_col]].sort_values([date_col, id_col])
    wide = out.pivot(index=date_col, columns=id_col, values=target_col)
    if fill_missing_dates:
        wide = wide.reindex(pd.date_range(wide.index.min(), wide.index.max(), freq="D"))
    if fillna0:
        wide = wide.fillna(0.0)
    wide = wide.sort_index(axis=1)
    wide.index.name = None
    wide.columns.name = None
    return wide.astype(float)


def _long_frame(seed=0, gaps=True):
    rng = np.random.default_rng(seed)
    dates = pd.date_range("2024-01-01", periods=30, freq="D")
    rows = []
    for j in range(4):
        for i, d in enumerate(dates):
            if gaps and rng.random() < 0.2:
                continue  # missing observations
            rows.append(
                {
                    "date": d.strftime("%Y-%m-%d"),
                    "id": f"store {j}  item",  # spaces -> normalised
                    "target": float(rng.integers(0, 10)),
                }
            )
    frame = pd.DataFrame(rows)
    return frame.sample(frac=1.0, random_state=3).reset_index(drop=True)  # unsorted


@pytest.mark.parametrize("fill_missing", [True, False])
@pytest.mark.parametrize("fillna0", [True, False])
def test_vectorised_pivot_matches_pandas(fill_missing, fillna0):
    df = _long_frame()
    got = pivot_long_to_wide(df, "date", "id", "target", fill_missing, fillna0)
    expected = _pandas_pivot(df, "date", "id", "target", fill_missing, fillna0)
    pd.testing.assert_frame_equal(got, expected)


def test_pivot_duplicate_pairs_raise():
    df = _long_frame(gaps=False)
    dup = pd.concat([df, df.iloc[[0]]], ignore_index=True)
    with pytest.raises(ValueError, match="duplicate"):
        pivot_long_to_wide(dup, "date", "id", "target")


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference checkout missing")
def test_pivot_matches_reference_implementation():
    from timesnet_forecast.utils.io import pivot_long_to_wide as ref_pivot

    df = _long_frame(seed=5)
    got = pivot_long_to_wide(df, "date", "id", "target", True, True)
    expected = ref_pivot(df, "date", "id", "target", True, True)
    pd.testing.assert_frame_equal(got, expected)


def test_scaler_round_trip():
    df = _long_frame(gaps=False)
    wide = pivot_long_to_wide(df, "date", "id", "target")
    for method in ("zscore", "minmax"):
        scaler, normed = fit_series_scaler(wide, method)
        arr = transform_array(wide.to_numpy(np.float32), list(wide.columns), scaler, method)
        np.testing.assert_allclose(arr, normed.to_numpy(np.float32), rtol=1e-5, atol=1e-5)
        back = inverse_transform(arr, list(wide.columns), scaler, method)
        np.testing.assert_allclose(back, wide.to_numpy(np.float32), rtol=1e-4, atol=1e-4)


def test_pivot_preserves_subdaily_resolution():
    """Hourly data must not collapse onto the daily fill grid.

    Regression: ``fill_missing_dates`` used a hard-coded ``freq="D"`` reindex,
    which dropped every non-midnight row (the hourly long-context benchmark
    lost 23/24 of its history and training failed with an empty val split).
    Sub-daily indexes fill at the smallest observed spacing instead.
    """

    idx = pd.date_range("2024-01-01", periods=72, freq="h")
    keep = np.ones(72, bool)
    keep[[10, 33]] = False
    df = pd.DataFrame(
        {
            "date": np.repeat(idx[keep].astype(str), 2),
            "id": ["a", "b"] * int(keep.sum()),
            "target": np.arange(2 * int(keep.sum()), dtype=float),
        }
    )
    wide = pivot_long_to_wide(df, "date", "id", "target", True, True)
    assert wide.shape == (72, 2)  # missing hours filled, none dropped
    assert float(wide.iloc[10, 0]) == 0.0 and float(wide.iloc[33, 1]) == 0.0
    assert (wide.index[1] - wide.index[0]) == pd.Timedelta(hours=1)


def test_pivot_irregular_subdaily_skips_fill():
    ts = pd.to_datetime(
        ["2024-01-01 00:00", "2024-01-01 00:07", "2024-01-01 00:11", "2024-01-01 09:00"]
    )
    df = pd.DataFrame({"date": ts.astype(str), "id": "a", "target": 1.0})
    wide = pivot_long_to_wide(df, "date", "id", "target", True, True)
    assert wide.shape == (4, 1)  # no grid fits: skip the fill, lose nothing
