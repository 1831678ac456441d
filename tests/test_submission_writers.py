"""Submission writer behaviours: template fill, synthesis, missing policies."""

import numpy as np
import pandas as pd
import pytest

from flow_timesnet_tpu.utils.submission import (
    SubmissionRowMeta,
    build_submission_context,
    get_submission_writer,
    merge_forecasts,
)


def _context(sample_df=None, fmt_cfg=None, new_ids=()):
    preds = pd.DataFrame(
        {
            "menu_a": [1.0, 2.0],
            "menu_b": [3.0, 4.0],
        },
        index=["TEST_00+D1", "TEST_00+D2"],
    )
    row_meta = {
        "TEST_00+D1": SubmissionRowMeta("TEST_00", 1, pd.Timestamp("2024-02-01")),
        "TEST_00+D2": SubmissionRowMeta("TEST_00", 2, pd.Timestamp("2024-02-02")),
    }
    ctx = build_submission_context(
        predictions=preds,
        sample_df=sample_df,
        row_meta=row_meta,
        row_order=["TEST_00+D1", "TEST_00+D2"],
        test_parts={"TEST_00": ["TEST_00+D1", "TEST_00+D2"]},
        ids=["menu_a", "menu_b"],
        new_ids=list(new_ids),
        missing_ids=[],
        missing_by_part={"TEST_00": []},
        submission_cfg=fmt_cfg or {},
    )
    return preds, ctx


def test_row_key_writer_fills_sample_template():
    sample = pd.DataFrame(
        {
            "row_key": ["TEST_00+Day 1", "TEST_00+2일"],
            "menu a": [0.0, 0.0],  # un-normalised header maps to menu_a
            "menu_b": [0.0, 0.0],
        }
    )
    preds, ctx = _context(sample_df=sample)
    out = get_submission_writer("row_key")().render(preds, ctx)
    assert list(out.columns) == ["row_key", "menu a", "menu_b"]
    np.testing.assert_allclose(out["menu a"].to_numpy(), [1.0, 2.0])
    np.testing.assert_allclose(out["menu_b"].to_numpy(), [3.0, 4.0])


def test_row_key_writer_synthesizes_template():
    preds, ctx = _context(sample_df=None)
    out = get_submission_writer("row_key_long")().render(preds, ctx)
    assert list(out.columns) == ["row_key", "menu_a", "menu_b"]
    assert list(out["row_key"]) == ["TEST_00+D1", "TEST_00+D2"]


def test_date_menu_writer_uses_dates():
    preds, ctx = _context(fmt_cfg={"date_col": "영업일자"})
    out = get_submission_writer("date_menu")().render(preds, ctx)
    assert list(out.columns)[0] == "영업일자"
    assert out["영업일자"].iloc[0] == pd.Timestamp("2024-02-01")


def test_missing_policy_error_raises():
    sample = pd.DataFrame(
        {"row_key": ["TEST_00+D1", "TEST_99+D1"], "menu_a": [0.0, 0.0], "menu_b": [0.0, 0.0]}
    )
    preds, ctx = _context(sample_df=sample)
    with pytest.raises(KeyError):
        get_submission_writer("row_key")(missing_policy="error").render(preds, ctx)
    out = get_submission_writer("row_key")(default_fill_value=7.0).render(preds, ctx)
    np.testing.assert_allclose(out.iloc[1, 1:].to_numpy(dtype=float), [7.0, 7.0])


def test_new_ids_get_default_fill_columns():
    preds, ctx = _context(new_ids=["menu_new"])
    out = get_submission_writer("row_key")().render(preds, ctx)
    assert "menu_new" in out.columns
    np.testing.assert_allclose(out["menu_new"].to_numpy(), [0.0, 0.0])


def test_unknown_format_raises():
    with pytest.raises(KeyError):
        get_submission_writer("nope")


def test_merge_forecasts_normalises_headers():
    df1 = pd.DataFrame({"row_key": ["a+D1"], "menu  x": [1.0]})
    df2 = pd.DataFrame({"row_key": ["b+D1"], "menu_x": [2.0]})
    merged = merge_forecasts([df1, df2])
    assert list(merged.columns) == ["menu_x"]
    assert len(merged) == 2


def test_nan_in_present_column_passes_through():
    # NaN in a column the predictions DO carry must stay NaN (it is a real
    # model output), while columns absent from predictions get the default.
    preds, ctx = _context(sample_df=None)
    preds.loc["TEST_00+D1", "menu_a"] = np.nan
    out = get_submission_writer("row_key")().render(preds, ctx)
    assert np.isnan(out["menu_a"].to_numpy()[0])
    assert out["menu_a"].to_numpy()[1] == 2.0


def test_render_scales_to_10k_columns():
    # Regression guard: the per-cell fill path took >1 h at N=10k series
    # (one .loc row-assignment per template row); the vectorised reindex
    # must keep this in seconds even on a contended single-core host.
    import time

    n_ids = 10_000
    ids = [f"menu_{i:05d}" for i in range(n_ids)]
    row_keys = [f"TEST_{p:02d}+D{d}" for p in range(5) for d in range(1, 8)]
    preds = pd.DataFrame(
        np.random.default_rng(0).random((len(row_keys), n_ids)).astype(np.float32),
        columns=ids,
        index=row_keys,
    )
    row_meta = {
        rk: SubmissionRowMeta(rk.split("+")[0], int(rk.split("+D")[1]))
        for rk in row_keys
    }
    sample = pd.DataFrame({"row_key": row_keys} | {c: 0.0 for c in ids})
    ctx = build_submission_context(
        predictions=preds,
        sample_df=sample,
        row_meta=row_meta,
        row_order=row_keys,
        test_parts={f"TEST_{p:02d}": [] for p in range(5)},
        ids=ids,
        new_ids=[],
        missing_ids=[],
        missing_by_part={},
        submission_cfg={"format": "row_key"},
    )
    t0 = time.monotonic()
    out = get_submission_writer("row_key")().render(preds, ctx)
    elapsed = time.monotonic() - t0
    assert out.shape == (len(row_keys), n_ids + 1)
    np.testing.assert_allclose(
        out[ids[7]].to_numpy(), preds[ids[7]].to_numpy(), rtol=1e-6
    )
    assert elapsed < 60.0, f"10k-column render took {elapsed:.1f}s"
