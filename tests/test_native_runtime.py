"""Native C++ window-gather: availability, parity with numpy, and fallback."""

import numpy as np
import pytest

from flow_timesnet_tpu.runtime.native import get_native_gather, native_available
from flow_timesnet_tpu.data.windows import SlidingWindowSource


def test_native_library_builds_and_loads():
    assert native_available(), "g++ toolchain present; native gather must build"


@pytest.mark.skipif(not native_available(), reason="native gather unavailable")
def test_native_gather_matches_numpy():
    rng = np.random.default_rng(0)
    T, N, L, H, B = 50, 7, 12, 3, 64
    X = rng.standard_normal((T, N)).astype(np.float32)
    M = (rng.random((T, N)) > 0.2).astype(np.float32)
    starts = rng.integers(0, T - L - H + 1, B).astype(np.int64)
    series = rng.integers(0, N, B).astype(np.int64)

    native = get_native_gather()
    x, y, m = native.gather_windows(X, M, starts, series, L, H)
    t_in = starts[:, None] + np.arange(L)[None, :]
    t_out = (starts + L)[:, None] + np.arange(H)[None, :]
    np.testing.assert_array_equal(x, X[t_in, series[:, None]][..., None])
    np.testing.assert_array_equal(y, X[t_out, series[:, None]][..., None])
    np.testing.assert_array_equal(m, M[t_out, series[:, None]][..., None])

    marks = rng.standard_normal((T, 5)).astype(np.float32)
    got = native.gather_marks(marks, starts, L)
    np.testing.assert_array_equal(got, marks[t_in])


def test_source_gather_same_with_and_without_native(monkeypatch):
    rng = np.random.default_rng(1)
    T, N = 40, 3
    X = rng.standard_normal((T, N)).astype(np.float32)
    M = (rng.random((T, N)) > 0.1).astype(np.float32)
    src = SlidingWindowSource(X, 10, 2, "direct", valid_mask=M,
                              series_ids=np.arange(N))
    idx = rng.permutation(len(src))[:32]
    with_native = src.gather(idx, rng=None)
    monkeypatch.setattr(
        "flow_timesnet_tpu.data.windows.get_native_gather", lambda: None
    )
    without = src.gather(idx, rng=None)
    np.testing.assert_array_equal(with_native.x, without.x)
    np.testing.assert_array_equal(with_native.y, without.y)
    np.testing.assert_array_equal(with_native.mask, without.mask)
