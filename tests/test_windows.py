"""Sliding-window source/batcher semantics.

Mirrors the reference dataset tests (``tests/test_dataset_pmax.py``):
per-(window, series) flattening, time-mark alignment, masks, stride, and the
padded final eval batch.
"""

import numpy as np
import pandas as pd
import pytest

from flow_timesnet_tpu.data.windows import SlidingWindowSource, WindowBatcher, build_batcher


def _source(T=20, N=3, L=6, H=2, **kw):
    X = np.arange(T * N, dtype=np.float32).reshape(T, N)
    return X, SlidingWindowSource(X, L, H, "direct", **kw)


def test_per_series_flattening_matches_reference_indexing():
    X, src = _source()
    T, N, L, H = 20, 3, 6, 2
    windows = T - L - H + 1
    assert len(src) == windows * N
    idx = np.arange(len(src))
    batch = src.gather(idx, rng=None)
    for flat in [0, 5, 17, len(src) - 1]:
        w, s = flat // N, flat % N
        np.testing.assert_array_equal(batch.x[flat, :, 0], X[w : w + L, s])
        np.testing.assert_array_equal(batch.y[flat, :, 0], X[w + L : w + L + H, s])
    assert batch.x.shape == (len(src), L, 1)
    assert batch.mask.shape == (len(src), H, 1)


def test_stride_and_recursive_lengths():
    X = np.zeros((30, 2), np.float32)
    src = SlidingWindowSource(X, 8, 4, "direct", stride=3)
    starts = src.starts
    assert starts[0] == 0 and np.all(np.diff(starts) == 3)
    rec_train = SlidingWindowSource(X, 8, 4, "recursive")
    assert rec_train.H == 1
    rec_val = SlidingWindowSource(X, 8, 4, "recursive", recursive_pred_len=4)
    assert rec_val.H == 4


def test_time_marks_align_with_windows():
    T, N, L, H = 15, 2, 5, 2
    X = np.zeros((T, N), np.float32)
    idx = pd.date_range("2024-03-01", periods=T, freq="D")
    src = SlidingWindowSource(
        X, L, H, "direct", time_index=idx,
        time_feature_config={"enabled": True, "features": ["day_of_week"],
                             "encoding": "numeric", "normalize": False},
    )
    assert src.time_feature_dim == 1
    batch = src.gather(np.asarray([0, N]), rng=None)  # windows 0 and 1, series 0
    # window 1 starts one day later
    np.testing.assert_array_equal(
        batch.x_mark[0, 1:, 0], batch.x_mark[1, :-1, 0]
    )
    dows = idx.dayofweek.to_numpy()
    np.testing.assert_array_equal(batch.x_mark[0, :, 0], dows[:L])
    np.testing.assert_array_equal(batch.y_mark[0, :, 0], dows[L : L + H])


def test_masks_and_static_and_ids_flow_through():
    T, N = 12, 2
    X = np.ones((T, N), np.float32)
    M = np.ones((T, N), np.float32)
    M[8, 0] = 0.0
    static = np.asarray([[1.0, 2.0], [3.0, 4.0]], np.float32)
    src = SlidingWindowSource(
        X, 4, 2, "direct", valid_mask=M, series_static=static, series_ids=np.arange(N)
    )
    flat = 4 * N + 0  # window 4, series 0 -> y covers rows 8..9
    batch = src.gather(np.asarray([flat]), rng=None)
    np.testing.assert_array_equal(batch.mask[0, :, 0], [0.0, 1.0])
    np.testing.assert_array_equal(batch.static[0, 0], static[0])
    assert batch.series_ids[0, 0] == 0


def test_batcher_pads_final_batch_and_marks_invalid():
    X = np.zeros((16, 1), np.float32)
    batcher = build_batcher(
        [X], [None], 6, 2, 1, "direct", batch_size=4, shuffle=False,
        drop_last=False, pad_final=True,
    )
    batches = list(batcher)
    total = sum(int(b.row_valid.sum()) for b in batches)
    assert total == len(batcher.sources[0])
    last = batches[-1]
    assert last.x.shape[0] == 4
    assert last.row_valid.sum() < 4
    # padded rows are fully zero and masked
    pad_rows = last.row_valid == 0
    assert np.all(last.mask[pad_rows] == 0)


def test_batcher_drop_last_and_shuffle_determinism():
    X = np.zeros((30, 2), np.float32)
    b1 = build_batcher([X], [None], 6, 2, 1, "direct", 8, shuffle=True,
                       drop_last=True, seed=3)
    b2 = build_batcher([X], [None], 6, 2, 1, "direct", 8, shuffle=True,
                       drop_last=True, seed=3)
    for x1, x2 in zip(b1, b2):
        np.testing.assert_array_equal(x1.x, x2.x)
    for b in build_batcher([X], [None], 6, 2, 1, "direct", 8, shuffle=False,
                           drop_last=True):
        assert b.x.shape[0] == 8


def test_augmentation_stays_in_bounds():
    T, N, L, H = 25, 1, 8, 3
    X = np.arange(T, dtype=np.float32).reshape(T, N)
    src = SlidingWindowSource(
        X, L, H, "direct", augment={"time_shift": 4, "add_noise_std": 0.0}
    )
    rng = np.random.default_rng(0)
    batch = src.gather(np.arange(len(src)), rng=rng)
    # every x window must still be a contiguous slice within [0, T-L-H]
    starts = batch.x[:, 0, 0]
    assert np.all(starts >= 0)
    assert np.all(starts <= T - L - H)
    deltas = np.diff(batch.x[:, :, 0], axis=1)
    assert np.all(deltas == 1.0)


def test_multi_fold_concat_and_global_order():
    X1 = np.zeros((12, 1), np.float32)
    X2 = np.ones((12, 1), np.float32)
    batcher = build_batcher(
        [X1, X2], [None, None], 4, 2, 1, "direct", batch_size=100,
        shuffle=False, drop_last=False,
    )
    batches = list(batcher)
    assert len(batches) == 1
    n1 = len(batcher.sources[0])
    vals = batches[0].x[:, 0, 0]
    assert np.all(vals[:n1] == 0.0)
    assert np.all(vals[n1:] == 1.0)


def test_prefetcher_matches_direct_iteration_and_propagates_errors():
    """Prefetcher must yield the exact same epoch stream as direct iteration."""

    import numpy as np

    from flow_timesnet_tpu.data.windows import Prefetcher, build_batcher

    rng = np.random.default_rng(0)
    X = rng.normal(5.0, 2.0, size=(40, 3)).astype(np.float32)
    M = (rng.random((40, 3)) > 0.1).astype(np.float32)
    batcher = build_batcher(
        [X], [M], 8, 4, 1, "direct", batch_size=16, shuffle=True,
        drop_last=False, pad_final=True,
    )
    batcher.set_epoch(3)
    direct = [b.x.copy() for b in batcher]
    batcher.set_epoch(3)
    fetched = [b.x.copy() for b in Prefetcher(batcher, depth=2)]
    assert len(direct) == len(fetched)
    for a, b in zip(direct, fetched):
        np.testing.assert_array_equal(a, b)

    def boom():
        yield 1
        raise RuntimeError("producer failed")

    it = Prefetcher(boom(), depth=1)
    assert next(it) == 1
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="producer failed"):
        for _ in it:
            pass


def test_prefetcher_close_releases_blocked_producer():
    """close() must unblock a producer stuck on a full queue and join it."""

    import itertools
    import time as _time

    from flow_timesnet_tpu.data.windows import Prefetcher

    it = Prefetcher(itertools.count(), depth=1)  # endless producer
    assert next(it) == 0
    _time.sleep(0.05)  # let the producer fill the queue and block on put
    it.close()
    assert not it._thread.is_alive()
    # a late next() must terminate, not hang
    import pytest as _pytest

    with _pytest.raises(StopIteration):
        next(it)
