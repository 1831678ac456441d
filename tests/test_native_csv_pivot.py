"""Native C++ CSV->pivot engine vs the pandas path (the semantic oracle).

The native engine (``runtime/csv_pivot.cpp``) must either produce exactly
the pandas result (``data/pivot.py::pivot_long_to_wide``) or decline so
:func:`read_long_pivot` falls back — never silently differ.
"""

import math
import os

import numpy as np
import pandas as pd
import pytest

from flow_timesnet_tpu.data.pivot import (
    _native_read_long_pivot,
    pivot_long_to_wide,
    read_long_pivot,
)
from flow_timesnet_tpu.runtime.native import get_native_csv_pivot

pytestmark = pytest.mark.skipif(
    get_native_csv_pivot() is None, reason="native csv_pivot unavailable"
)


def _pandas(path, **kw):
    df = pd.read_csv(path, encoding=kw.pop("encoding", "utf-8"))
    return pivot_long_to_wide(df, date_col="date", id_col="id",
                              target_col="target", **kw)


def _assert_same(native, ref):
    assert native is not None, "native path declined unexpectedly"
    assert list(native.columns) == list(ref.columns)
    assert list(native.index) == list(ref.index)
    np.testing.assert_allclose(
        native.to_numpy(float), ref.to_numpy(float), rtol=0, atol=0
    )


def _write(tmp_path, text, name="data.csv"):
    p = tmp_path / name
    p.write_bytes(text.encode("utf-8") if isinstance(text, str) else text)
    return str(p)


def test_basic_grid_matches_pandas(tmp_path):
    rows = ["date,id,target"]
    rng = np.random.default_rng(0)
    for d in pd.date_range("2024-01-01", periods=30, freq="D"):
        for sid in ["alpha", "beta", "gamma"]:
            rows.append(f"{d.date()},{sid},{rng.integers(0, 50)}")
    path = _write(tmp_path, "\n".join(rows) + "\n")
    native = _native_read_long_pivot(path, "date", "id", "target", True, "utf-8")
    _assert_same(native.fillna(0.0), _pandas(path))


def test_missing_pairs_and_dates_nan_semantics(tmp_path):
    # series beta missing on some days; one calendar day entirely absent
    lines = ["date,id,target"]
    for day, sid, v in [
        ("2024-01-01", "alpha", 1.5), ("2024-01-01", "beta", 2.0),
        ("2024-01-02", "alpha", 3.0),
        ("2024-01-04", "alpha", 4.0), ("2024-01-04", "beta", 5.5),
    ]:
        lines.append(f"{day},{sid},{v}")
    path = _write(tmp_path, "\n".join(lines) + "\n")
    ref = _pandas(path, fillna0=False)
    native = _native_read_long_pivot(path, "date", "id", "target", True, "utf-8")
    assert list(native.columns) == list(ref.columns)
    assert (native.isna().to_numpy() == ref.isna().to_numpy()).all()
    np.testing.assert_allclose(
        np.nan_to_num(native.to_numpy(float), nan=-777.0),
        np.nan_to_num(ref.to_numpy(float), nan=-777.0),
    )
    # and the filled-0 contract through the public entry point
    _assert_same(
        read_long_pivot(path, "date", "id", "target", fillna0=True),
        _pandas(path, fillna0=True),
    )


def test_unicode_ids_and_whitespace_normalisation(tmp_path):
    # Korean ids with ASCII + ideographic (U+3000) whitespace runs: the
    # normaliser must collapse to single underscores exactly like
    # normalize_id, and byte-wise sort must equal Python's sorted()
    ids = ["담하  막국수", "담하　비빔밥", "미라시아 BBQ립", "Zz last"]
    lines = ["date,id,target"]
    for d in ["2024-02-01", "2024-02-02"]:
        for i, sid in enumerate(ids):
            lines.append(f"{d},{sid},{i + 0.25}")
    path = _write(tmp_path, "\n".join(lines) + "\n")
    native = _native_read_long_pivot(path, "date", "id", "target", True, "utf-8")
    _assert_same(native.fillna(0.0), _pandas(path))
    assert "담하_막국수" in native.columns
    assert "담하_비빔밥" in native.columns


def test_quoted_fields_crlf_bom(tmp_path):
    body = (
        'date,id,target\r\n'
        '2024-03-01,"store, one",1\r\n'
        '2024-03-01,"say ""hi""",2\r\n'
        '2024-03-02,"store, one",3\r\n'
        '2024-03-02,"say ""hi""",4\r\n'
    )
    path = _write(tmp_path, b"\xef\xbb\xbf" + body.encode("utf-8"))
    native = _native_read_long_pivot(path, "date", "id", "target", True, "utf-8")
    _assert_same(native.fillna(0.0), _pandas(path))
    assert "store,_one" in native.columns  # comma kept, space collapsed


def test_extra_columns_and_column_order(tmp_path):
    # target/id/date in a scrambled order with an ignored extra column
    lines = ["extra,target,date,id"]
    for d in ["2024-04-01", "2024-04-02", "2024-04-03"]:
        for sid in ["s1", "s2"]:
            lines.append(f"x,{hash((d, sid)) % 7},{d},{sid}")
    path = _write(tmp_path, "\n".join(lines) + "\n")
    native = _native_read_long_pivot(path, "date", "id", "target", True, "utf-8")
    ref = _pandas(path)
    _assert_same(native.fillna(0.0), ref)


def test_duplicate_pair_falls_back_to_pandas_error(tmp_path):
    lines = [
        "date,id,target",
        "2024-05-01,s1,1",
        "2024-05-01,s1,2",
    ]
    path = _write(tmp_path, "\n".join(lines) + "\n")
    assert _native_read_long_pivot(path, "date", "id", "target", True, "utf-8") is None
    with pytest.raises(ValueError, match="duplicate"):
        read_long_pivot(path, "date", "id", "target")


def test_non_iso_dates_decline_but_public_path_works(tmp_path):
    lines = ["date,id,target", "01/06/2024,s1,1", "01/07/2024,s1,2"]
    path = _write(tmp_path, "\n".join(lines) + "\n")
    assert _native_read_long_pivot(path, "date", "id", "target", True, "utf-8") is None
    out = read_long_pivot(path, "date", "id", "target")  # pandas fallback
    assert out.shape[1] == 1


def test_bad_float_declines(tmp_path):
    lines = ["date,id,target", "2024-06-01,s1,abc"]
    path = _write(tmp_path, "\n".join(lines) + "\n")
    assert _native_read_long_pivot(path, "date", "id", "target", True, "utf-8") is None


def test_empty_target_is_nan_cell(tmp_path):
    lines = [
        "date,id,target",
        "2024-06-01,s1,",
        "2024-06-01,s2,5",
        "2024-06-02,s1,1",
        "2024-06-02,s2,2",
    ]
    path = _write(tmp_path, "\n".join(lines) + "\n")
    native = _native_read_long_pivot(path, "date", "id", "target", True, "utf-8")
    ref = _pandas(path, fillna0=False)
    assert math.isnan(native.iloc[0, 0]) and math.isnan(ref.iloc[0, 0])
    assert native.iloc[0, 1] == 5.0


def test_blank_lines_and_no_trailing_newline(tmp_path):
    body = "date,id,target\n\n2024-07-01,s1,1\n\n2024-07-02,s1,2"
    path = _write(tmp_path, body)
    native = _native_read_long_pivot(path, "date", "id", "target", True, "utf-8")
    _assert_same(native.fillna(0.0), _pandas(path))


def test_fill_missing_dates_off(tmp_path):
    lines = ["date,id,target", "2024-08-01,s1,1", "2024-08-05,s1,2"]
    path = _write(tmp_path, "\n".join(lines) + "\n")
    native = _native_read_long_pivot(path, "date", "id", "target", False, "utf-8")
    ref = _pandas(path, fill_missing_dates=False)
    _assert_same(native.fillna(0.0), ref)
    assert len(native.index) == 2  # no calendar reindex


def test_random_fuzz_against_pandas(tmp_path):
    rng = np.random.default_rng(42)
    for trial in range(5):
        n_series = int(rng.integers(1, 8))
        n_days = int(rng.integers(2, 40))
        ids = [f"s {i}_메뉴{i}" if i % 2 else f"plain{i}" for i in range(n_series)]
        days = pd.date_range("2023-01-01", periods=n_days, freq="D")
        lines = ["date,id,target"]
        for d in days:
            for sid in ids:
                if rng.random() < 0.8:  # random missing pairs
                    lines.append(f"{d.date()},{sid},{rng.normal():.6g}")
        path = _write(tmp_path, "\n".join(lines) + "\n", name=f"f{trial}.csv")
        ref = _pandas(path, fillna0=False)
        native = _native_read_long_pivot(path, "date", "id", "target", True, "utf-8")
        assert native is not None
        assert list(native.columns) == list(ref.columns)
        np.testing.assert_allclose(
            np.nan_to_num(native.to_numpy(float), nan=-777.0),
            np.nan_to_num(ref.to_numpy(float), nan=-777.0),
            rtol=1e-6,
        )


def test_float64_exactness_beyond_f32(tmp_path):
    """Values that float32 rounds must survive exactly (ADVICE r2 medium)."""

    lines = [
        "date,id,target",
        "2024-01-01,a,16777217",          # 2^24 + 1 (f32 rounds to 16777216)
        "2024-01-01,b,0.1",               # f32 -> 0.10000000149...
        "2024-01-02,a,9007199254740993",  # 2^53 + 1: > 15 digits, strtod path
        "2024-01-02,b,-1234567890123456.25",
    ]
    path = _write(tmp_path, "\n".join(lines) + "\n")
    native = _native_read_long_pivot(path, "date", "id", "target", True, "utf-8")
    ref = _pandas(path, fillna0=False)
    _assert_same(native, ref)
    assert native.loc["2024-01-01", "a"] == 16777217.0
    assert native.loc["2024-01-01", "b"] == 0.1


@pytest.mark.parametrize(
    "bad_id",
    ["007", "1.50", "NA", "nan", " 42 ", "-3", "1e3", "NULL", "", "inf"],
)
def test_numeric_or_na_ids_decline_to_pandas(tmp_path, bad_id):
    """Ids pandas would dtype-infer or NA-filter make the native engine
    decline so the pandas path stays the oracle (ADVICE r2 medium) — whether
    the oracle then succeeds with different column names ('007' -> '7') or
    raises (NaN ids), the fast path must never answer differently."""

    lines = [
        "date,id,target",
        f'2024-01-01,"{bad_id}",1',
        "2024-01-01,alpha,2",
    ]
    path = _write(tmp_path, "\n".join(lines) + "\n")
    native = _native_read_long_pivot(path, "date", "id", "target", True, "utf-8")
    assert native is None


@pytest.mark.parametrize("numeric_id,pandas_name", [("007", "7"), ("1.50", "1.5")])
def test_numeric_id_fallback_matches_pandas_naming(tmp_path, numeric_id, pandas_name):
    lines = ["date,id,target", f"2024-01-01,{numeric_id},1"]
    path = _write(tmp_path, "\n".join(lines) + "\n")
    wide = read_long_pivot(path, "date", "id", "target", fillna0=False)
    assert list(wide.columns) == [pandas_name]  # pandas dtype inference wins


def test_hex_like_ids_stay_native(tmp_path):
    # strtod would parse 0x1A but pandas keeps it an object column
    lines = ["date,id,target", "2024-01-01,0x1A,1", "2024-01-01,alpha,2"]
    path = _write(tmp_path, "\n".join(lines) + "\n")
    native = _native_read_long_pivot(path, "date", "id", "target", True, "utf-8")
    _assert_same(native, _pandas(path, fillna0=False))


def test_record_wider_than_header_declines(tmp_path):
    """pandas rejects or index-shifts over-wide records; the fast path must
    decline rather than silently ignore the extra fields (ADVICE r2 low)."""

    lines = [
        "date,id,target",
        "2024-01-01,alpha,1",
        "2024-01-02,alpha,2,EXTRA",
    ]
    path = _write(tmp_path, "\n".join(lines) + "\n")
    native = _native_read_long_pivot(path, "date", "id", "target", True, "utf-8")
    assert native is None


def test_train_once_uses_native_path_transparently(tmp_path, monkeypatch):
    """Drive the real train pipeline twice — native engine on and genuinely
    off (loader cache reset so the env gate re-evaluates) — and require the
    identical best validation NLL (ADVICE r2 low: the old version never
    called train_once and its monkeypatch was a no-op)."""

    from flow_timesnet_tpu.runtime import native as native_mod
    from flow_timesnet_tpu.train import train_once

    lines = ["date,id,target"]
    rng = np.random.default_rng(1)
    for d in pd.date_range("2024-01-01", periods=70, freq="D"):
        for sid in ["a_store", "b_store"]:
            lines.append(f"{d.date()},{sid},{rng.integers(0, 9)}")
    path = _write(tmp_path, "\n".join(lines) + "\n")

    def cfg(tag):
        return {
            "data": {"train_csv": path, "date_col": "date", "id_col": "id",
                     "target_col": "target", "horizon": 4},
            "preprocess": {"normalize": "none"},
            "train": {"device": "cpu", "epochs": 1, "batch_size": 8,
                      "lr": 1e-3, "use_loss_masking": True,
                      "val": {"strategy": "holdout", "holdout_days": 20}},
            "model": {"mode": "direct", "input_len": 14, "pred_len": 4,
                      "d_model": 8, "d_ff": 16, "n_layers": 1, "k_periods": 2,
                      "kernel_set": [[3, 3]], "dropout": 0.0,
                      "id_embed_dim": 4, "static_proj_dim": 4},
            "artifacts": {"dir": str(tmp_path / tag)},
            "tuning": {"seed": 7},
        }

    assert native_mod.get_native_csv_pivot() is not None
    nll_native, _ = train_once(cfg("native"))

    monkeypatch.setenv("FLOW_TIMESNET_DISABLE_NATIVE", "1")
    native_mod.reset_native_cache_for_tests()
    try:
        assert native_mod.get_native_csv_pivot() is None  # gate really off
        nll_pandas, _ = train_once(cfg("pandas"))
    finally:
        monkeypatch.delenv("FLOW_TIMESNET_DISABLE_NATIVE")
        native_mod.reset_native_cache_for_tests()

    assert nll_native == pytest.approx(nll_pandas, rel=1e-6)
