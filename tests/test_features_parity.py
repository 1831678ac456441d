"""Time/static feature extractors vs the reference implementations."""

import numpy as np
import pandas as pd
import pytest

from torch_ref import HAS_REFERENCE

from flow_timesnet_tpu.data.static_features import compute_series_features
from flow_timesnet_tpu.data.time_features import build_time_features


def test_time_features_shapes_and_names():
    idx = pd.date_range("2024-01-01", periods=40, freq="D")
    cfg = {
        "enabled": True,
        "features": ["day_of_week", "day_of_month", "month", "day_of_year"],
        "encoding": "cyclical",
        "normalize": True,
    }
    feats, names = build_time_features(idx, cfg, return_names=True)
    assert feats.shape == (40, 8)
    assert names[:2] == ["day_of_week_sin", "day_of_week_cos"]
    # disabled -> empty
    empty = build_time_features(idx, {"enabled": False})
    assert empty.shape == (40, 0)


def test_time_feature_encodings():
    idx = pd.date_range("2024-01-01", periods=14, freq="D")
    onehot = build_time_features(
        idx, {"enabled": True, "features": ["day_of_week"], "encoding": "onehot"}
    )
    assert onehot.shape == (14, 7)
    np.testing.assert_allclose(onehot.sum(axis=1), 1.0)
    numeric = build_time_features(
        idx,
        {"enabled": True, "features": ["day_of_week"], "encoding": "numeric",
         "normalize": True},
    )
    assert numeric.max() <= 1.0
    mixed = build_time_features(
        idx,
        {
            "enabled": True,
            "features": ["day_of_week", "month"],
            "encoding": {"day_of_week": "onehot", "default": "numeric"},
        },
    )
    assert mixed.shape == (14, 8)
    with pytest.raises(ValueError, match="Unsupported encoding"):
        build_time_features(
            idx, {"enabled": True, "features": ["day_of_week"], "encoding": "bogus"}
        )
    with pytest.raises(ValueError, match="Unsupported time feature"):
        build_time_features(idx, {"enabled": True, "features": ["bogus"]})


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference checkout missing")
def test_time_features_match_reference():
    from timesnet_forecast.utils.time_features import build_time_features as ref_btf

    idx = pd.date_range("2023-11-20", periods=100, freq="D")
    for encoding in ("cyclical", "onehot", "numeric"):
        cfg = {
            "enabled": True,
            "features": ["day_of_week", "day_of_month", "month", "day_of_year",
                         "week_of_year"],
            "encoding": encoding,
            "normalize": True,
        }
        ours = build_time_features(idx, cfg)
        theirs = ref_btf(idx, cfg)
        np.testing.assert_allclose(ours, theirs, atol=1e-6)


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference checkout missing")
def test_static_features_match_reference():
    from timesnet_forecast.utils.static_features import (
        compute_series_features as ref_csf,
    )

    rng = np.random.default_rng(0)
    T, N = 60, 5
    values = rng.gamma(2.0, 3.0, size=(T, N)).astype(np.float32)
    mask = (rng.random((T, N)) > 0.2).astype(np.float32)
    wide = pd.DataFrame(values)
    mdf = pd.DataFrame(mask)
    ours, names = compute_series_features(wide, mdf)
    theirs, ref_names = ref_csf(wide, mdf)
    assert names == ref_names
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_static_features_empty_and_single_row():
    empty = pd.DataFrame(np.zeros((5, 0)))
    feats, names = compute_series_features(empty, empty)
    assert feats.shape == (0, 5)
    one = pd.DataFrame(np.ones((1, 3)))
    feats1, _ = compute_series_features(one, one)
    assert feats1.shape == (3, 5)
    np.testing.assert_allclose(feats1[:, 0], 1.0)  # mean
    np.testing.assert_allclose(feats1[:, 1:], 0.0)  # no variation
