"""min-sigma calibration statistics vs numpy oracles (mirrors the reference
``tests/test_min_sigma_method.py``)."""

import numpy as np
import pytest

from flow_timesnet_tpu.train import masked_std


def _data():
    rng = np.random.default_rng(0)
    a1 = rng.normal(2.0, 1.5, size=(30, 4)).astype(np.float32)
    a2 = rng.normal(-1.0, 0.5, size=(20, 4)).astype(np.float32)
    m1 = (rng.random((30, 4)) > 0.3).astype(np.float32)
    m2 = (rng.random((20, 4)) > 0.1).astype(np.float32)
    return [a1, a2], [m1, m2]


def test_global_masked_std_matches_numpy():
    arrays, masks = _data()
    got, per = masked_std(arrays, masks, "global")
    vals = np.concatenate(
        [a[m > 0] for a, m in zip(arrays, masks)]
    ).astype(np.float64)
    assert per is None
    assert got == pytest.approx(float(vals.std()), rel=1e-6)


def test_per_series_median_matches_numpy():
    arrays, masks = _data()
    got, per = masked_std(arrays, masks, "per_series_median")
    assert per is not None and per.shape == (4,)
    expected = []
    for j in range(4):
        vals = np.concatenate(
            [a[:, j][m[:, j] > 0] for a, m in zip(arrays, masks)]
        ).astype(np.float64)
        expected.append(vals.std())
    np.testing.assert_allclose(per, expected, rtol=1e-6)
    assert got == pytest.approx(float(np.median(expected)), rel=1e-6)


def test_masked_std_edge_cases():
    assert masked_std([], [], "global") == (0.0, None)
    zeros_mask = [np.zeros((5, 2), np.float32)]
    assert masked_std([np.ones((5, 2), np.float32)], zeros_mask, "global")[0] == 0.0
    with pytest.raises(ValueError, match="Unsupported min_sigma_method"):
        masked_std([np.ones((2, 2))], [None], "bogus")
    # None mask == all valid
    arr = np.arange(10, dtype=np.float32).reshape(5, 2)
    got, _ = masked_std([arr], [None], "global")
    assert got == pytest.approx(float(arr.astype(np.float64).std()), rel=1e-6)
