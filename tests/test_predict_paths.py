"""Predict-side path resolution and horizon-beyond-pred_len behaviour."""

import math
import os

import numpy as np
import pandas as pd
import pytest

from flow_timesnet_tpu.config import PipelineConfig
from flow_timesnet_tpu.predict import _resolve_test_paths, predict_once
from flow_timesnet_tpu.train import train_once


def test_resolve_test_paths_variants(tmp_path):
    d = tmp_path / "t"
    os.makedirs(d)
    for name in ("TEST_00.csv", "TEST_01.csv", "other.csv"):
        (d / name).write_text("x")
    # test_dir + default pattern
    got = _resolve_test_paths({"test_dir": str(d)})
    assert [os.path.basename(p) for p in got] == ["TEST_00.csv", "TEST_01.csv"]
    # custom pattern
    got = _resolve_test_paths({"test_dir": str(d), "test_pattern": "*.csv"})
    assert len(got) == 3
    # explicit glob
    got = _resolve_test_paths({"test_glob": str(d / "TEST_0*.csv")})
    assert len(got) == 2
    # explicit files list (deduped, sorted)
    got = _resolve_test_paths(
        {"test_files": [str(d / "TEST_01.csv"), str(d / "TEST_00.csv"), str(d / "TEST_01.csv")]}
    )
    assert [os.path.basename(p) for p in got] == ["TEST_00.csv", "TEST_01.csv"]
    # test_path pointing at a directory
    got = _resolve_test_paths({"test_path": str(d)})
    assert len(got) == 2


def test_horizon_beyond_pred_len_fills_defaults(tmp_path):
    """horizon=6 with pred_len=3: rows 4..6 get the default fill."""

    rng = np.random.default_rng(0)
    T = 40
    dates = pd.date_range("2024-01-01", periods=T, freq="D")
    rows = []
    for j in range(2):
        vals = np.maximum(
            np.round(4 + 2 * np.sin(2 * math.pi * np.arange(T) / 7) + rng.normal(0, 0.3, T)), 0
        )
        for d, v in zip(dates, vals):
            rows.append({"date": d.strftime("%Y-%m-%d"), "id": f"S{j}", "target": float(v)})
    train_csv = tmp_path / "train.csv"
    pd.DataFrame(rows).to_csv(train_csv, index=False)
    test_dir = tmp_path / "test"
    os.makedirs(test_dir)
    tdates = pd.date_range(dates[-1] + pd.Timedelta(days=1), periods=15, freq="D")
    trows = []
    for j in range(2):
        for d in tdates:
            trows.append({"date": d.strftime("%Y-%m-%d"), "id": f"S{j}", "target": 3.0})
    pd.DataFrame(trows).to_csv(test_dir / "TEST_00.csv", index=False)

    cfg = {
        "data": {
            "train_csv": str(train_csv), "test_dir": str(test_dir),
            "date_col": "date", "id_col": "id", "target_col": "target",
            "horizon": 6, "time_features": {"enabled": False},
        },
        "preprocess": {"normalize": "none", "clip_negative": True},
        "window": {"input_len": 12, "pred_len": 3},
        "model": {
            "mode": "direct", "input_len": 12, "pred_len": 3, "d_model": 8,
            "d_ff": 16, "n_layers": 1, "k_periods": 1, "min_period_threshold": 2,
            "kernel_set": [[3, 3]], "dropout": 0.0, "id_embed_dim": 2,
        },
        "train": {
            "device": "cpu", "epochs": 1, "batch_size": 8, "lr": 1e-3,
            "lr_warmup_steps": 0,
            "val": {"strategy": "holdout", "holdout_days": 16},
        },
        "artifacts": {"dir": str(tmp_path / "artifacts")},
        "submission": {"out_path": str(tmp_path / "sub.csv"), "format": "row_key",
                       "default_fill_value": -1.0},
        "tuning": {"seed": 1},
    }
    train_once(PipelineConfig.from_mapping(cfg))
    out = predict_once(PipelineConfig.from_mapping(cfg))
    sub = pd.read_csv(out)
    assert len(sub) == 6
    vals = sub.iloc[:, 1:].to_numpy(dtype=float)
    # first pred_len rows hold model output, the rest the default fill
    assert np.all(vals[:3] >= 0)
    assert np.all(vals[3:] == -1.0)


def test_recursive_mode_decodes_full_horizon(tmp_path):
    """horizon=6 with pred_len=3 in recursive mode: ALL rows carry forecasts.

    The scan rollout is horizon-agnostic, so unlike direct mode (which must
    zero-fill rows beyond pred_len — reference predict.py:189) the recursive
    decoder covers the full requested horizon.
    """

    rng = np.random.default_rng(0)
    T = 40
    dates = pd.date_range("2024-01-01", periods=T, freq="D")
    rows = []
    for j in range(2):
        vals = np.maximum(
            np.round(4 + 2 * np.sin(2 * math.pi * np.arange(T) / 7) + rng.normal(0, 0.3, T)), 0
        )
        for d, v in zip(dates, vals):
            rows.append({"date": d.strftime("%Y-%m-%d"), "id": f"S{j}", "target": float(v)})
    train_csv = tmp_path / "train.csv"
    pd.DataFrame(rows).to_csv(train_csv, index=False)
    test_dir = tmp_path / "test"
    os.makedirs(test_dir)
    tdates = pd.date_range(dates[-1] + pd.Timedelta(days=1), periods=15, freq="D")
    trows = []
    for j in range(2):
        for d in tdates:
            trows.append({"date": d.strftime("%Y-%m-%d"), "id": f"S{j}", "target": 3.0})
    pd.DataFrame(trows).to_csv(test_dir / "TEST_00.csv", index=False)

    cfg = {
        "data": {
            "train_csv": str(train_csv), "test_dir": str(test_dir),
            "date_col": "date", "id_col": "id", "target_col": "target",
            "horizon": 6, "time_features": {"enabled": False},
        },
        "preprocess": {"normalize": "none", "clip_negative": True},
        "window": {"input_len": 12, "pred_len": 3},
        "model": {
            "mode": "recursive", "input_len": 12, "pred_len": 3, "d_model": 8,
            "d_ff": 16, "n_layers": 1, "k_periods": 1, "min_period_threshold": 2,
            "kernel_set": [[3, 3]], "dropout": 0.0, "id_embed_dim": 2,
        },
        "train": {
            "device": "cpu", "epochs": 1, "batch_size": 8, "lr": 1e-3,
            "lr_warmup_steps": 0,
            "val": {"strategy": "holdout", "holdout_days": 16},
        },
        "artifacts": {"dir": str(tmp_path / "artifacts")},
        "submission": {"out_path": str(tmp_path / "sub.csv"), "format": "row_key",
                       "default_fill_value": -1.0},
        "tuning": {"seed": 1},
    }
    train_once(PipelineConfig.from_mapping(cfg))
    out = predict_once(PipelineConfig.from_mapping(cfg))
    sub = pd.read_csv(out)
    assert len(sub) == 6
    vals = sub.iloc[:, 1:].to_numpy(dtype=float)
    # every row is a rolled-out forecast; the -1 default fill appears nowhere
    assert np.all(vals >= 0)


def test_static_file_artifact_override(tmp_path):
    """artifacts.static_file wins over scaler metadata, with id alignment."""

    import pickle

    rng = np.random.default_rng(0)
    T = 40
    dates = pd.date_range("2024-01-01", periods=T, freq="D")
    rows = []
    for j in range(2):
        vals = np.maximum(np.round(4 + rng.normal(0, 0.5, T)), 0)
        for d, v in zip(dates, vals):
            rows.append({"date": d.strftime("%Y-%m-%d"), "id": f"S{j}", "target": float(v)})
    train_csv = tmp_path / "train.csv"
    pd.DataFrame(rows).to_csv(train_csv, index=False)
    test_dir = tmp_path / "test"
    os.makedirs(test_dir)
    tdates = pd.date_range(dates[-1] + pd.Timedelta(days=1), periods=14, freq="D")
    trows = []
    for j in range(2):
        for d in tdates:
            trows.append({"date": d.strftime("%Y-%m-%d"), "id": f"S{j}", "target": 3.0})
    pd.DataFrame(trows).to_csv(test_dir / "TEST_00.csv", index=False)

    cfg = {
        "data": {
            "train_csv": str(train_csv), "test_dir": str(test_dir),
            "date_col": "date", "id_col": "id", "target_col": "target",
            "horizon": 3, "time_features": {"enabled": False},
        },
        "preprocess": {"normalize": "none", "clip_negative": True},
        "window": {"input_len": 12, "pred_len": 3},
        "model": {
            "mode": "direct", "input_len": 12, "pred_len": 3, "d_model": 8,
            "d_ff": 16, "n_layers": 1, "k_periods": 1, "min_period_threshold": 2,
            "kernel_set": [[3, 3]], "dropout": 0.0, "id_embed_dim": 2,
            "static_proj_dim": 4,
        },
        "train": {
            "device": "cpu", "epochs": 1, "batch_size": 8, "lr": 1e-3,
            "lr_warmup_steps": 0,
            "val": {"strategy": "holdout", "holdout_days": 16},
        },
        "artifacts": {"dir": str(tmp_path / "artifacts")},
        "submission": {"out_path": str(tmp_path / "sub.csv"), "format": "row_key"},
        "tuning": {"seed": 1},
    }
    train_once(PipelineConfig.from_mapping(cfg))

    # standalone static artifact with permuted id order (must re-align)
    with open(tmp_path / "artifacts" / "scaler.pkl", "rb") as f:
        scaler_meta = pickle.load(f)
    statics = np.asarray(scaler_meta["static_features"])
    override = {"static_features": statics[::-1].copy(), "ids": ["S1", "S0"]}
    with open(tmp_path / "statics.pkl", "wb") as f:
        pickle.dump(override, f)
    cfg2 = dict(cfg)
    cfg2["artifacts"] = dict(cfg["artifacts"], static_file=str(tmp_path / "statics.pkl"))
    out = predict_once(PipelineConfig.from_mapping(cfg2))
    sub = pd.read_csv(out)
    assert np.all(np.isfinite(sub.iloc[:, 1:].to_numpy(dtype=float)))
    # aligned statics == scaler statics, so outputs match the default path
    out_default = predict_once(
        PipelineConfig.from_mapping({**cfg, "submission": {
            "out_path": str(tmp_path / "sub_default.csv"), "format": "row_key"}})
    )
    sub_default = pd.read_csv(out_default)
    np.testing.assert_allclose(
        sub.iloc[:, 1:].to_numpy(dtype=float),
        sub_default.iloc[:, 1:].to_numpy(dtype=float),
        rtol=1e-5,
    )
    # missing artifact falls back gracefully
    cfg3 = dict(cfg)
    cfg3["artifacts"] = dict(cfg["artifacts"], static_file=str(tmp_path / "nope.pkl"))
    cfg3["submission"] = {"out_path": str(tmp_path / "sub3.csv"), "format": "row_key"}
    predict_once(PipelineConfig.from_mapping(cfg3))


def test_predict_data_parallel_matches_single_device(tmp_path):
    """Data-parallel predict (predict.data_parallel, 8 virtual devices):
    the sharded + row-padded forward must reproduce the single-device
    submission (the forward is row-independent)."""

    import jax

    rng = np.random.default_rng(3)
    T = 48
    dates = pd.date_range("2024-01-01", periods=T, freq="D")
    rows = []
    for j in range(5):  # 5 series: pads 5 -> 8 on the virtual mesh
        # heterogeneous periodicities: the FFT selector takes a BATCH mean,
        # so duplicated padding rows would shift the selected periods for
        # every series unless the padded rows are masked out (row_valid)
        period = 7 if j < 3 else 4
        amp = 2.0 + j
        vals = np.maximum(
            np.round(
                4 + amp * np.sin(2 * math.pi * np.arange(T) / period)
                + rng.normal(0, 0.3, T)
            ),
            0,
        )
        for d, v in zip(dates, vals):
            rows.append({"date": d.strftime("%Y-%m-%d"), "id": f"S{j}", "target": float(v)})
    train_csv = tmp_path / "train.csv"
    pd.DataFrame(rows).to_csv(train_csv, index=False)
    test_dir = tmp_path / "test"
    os.makedirs(test_dir)
    tdates = pd.date_range(dates[-1] + pd.Timedelta(days=1), periods=14, freq="D")
    trows = [
        {"date": d.strftime("%Y-%m-%d"), "id": f"S{j}", "target": 3.0}
        for j in range(5)
        for d in tdates
    ]
    pd.DataFrame(trows).to_csv(test_dir / "TEST_00.csv", index=False)

    cfg = {
        "data": {
            "train_csv": str(train_csv), "test_dir": str(test_dir),
            "date_col": "date", "id_col": "id", "target_col": "target",
            "horizon": 3, "time_features": {"enabled": False},
        },
        "preprocess": {"normalize": "none", "clip_negative": True},
        "window": {"input_len": 12, "pred_len": 3},
        "model": {
            "mode": "direct", "input_len": 12, "pred_len": 3, "d_model": 8,
            "d_ff": 16, "n_layers": 1, "k_periods": 2, "min_period_threshold": 2,
            "kernel_set": [[3, 3]], "dropout": 0.0, "id_embed_dim": 2,
        },
        "train": {
            "device": "cpu", "epochs": 1, "batch_size": 8, "lr": 1e-3,
            "lr_warmup_steps": 0,
            "val": {"strategy": "holdout", "holdout_days": 16},
        },
        "artifacts": {"dir": str(tmp_path / "artifacts")},
        "submission": {"out_path": str(tmp_path / "sub_dp.csv"), "format": "row_key"},
        "tuning": {"seed": 1},
    }
    assert len(jax.devices()) == 8  # conftest virtual mesh
    train_once(PipelineConfig.from_mapping(cfg))
    out_dp = predict_once(PipelineConfig.from_mapping(cfg))

    cfg["predict"] = {"data_parallel": "off"}
    cfg["submission"] = {"out_path": str(tmp_path / "sub_1d.csv"), "format": "row_key"}
    out_1d = predict_once(PipelineConfig.from_mapping(cfg))

    dp = pd.read_csv(out_dp).set_index("row_key").to_numpy(dtype=float)
    sd = pd.read_csv(out_1d).set_index("row_key").to_numpy(dtype=float)
    assert dp.shape == sd.shape == (3, 5)
    np.testing.assert_allclose(dp, sd, rtol=1e-5, atol=1e-6)


def test_chunked_forward_matches_whole_batch(tmp_path):
    """predict.chunk_rows: fixed-shape chunked forwards reproduce the
    whole-batch predictions when the period selection is stable.

    Selection is a batch-mean top-k, but the softmax weights are per-sample
    (models/period.py::select_periods), so on a strongly periodic dataset
    every chunk selects the same periods and per-row outputs match the
    single [N, L, 1] forward. This is the high-cardinality predict path:
    one bounded compiled program regardless of N (the N=10k e2e run spent
    ~116 min compiling a batch-10,000 forward nothing else uses).
    """

    rng = np.random.default_rng(3)
    T, N = 60, 24
    dates = pd.date_range("2024-01-01", periods=T, freq="D")
    rows = []
    for j in range(N):
        vals = np.maximum(
            np.round(
                5
                + 3 * np.sin(2 * math.pi * (np.arange(T) + j) / 7)
                + rng.normal(0, 0.2, T)
            ),
            0,
        )
        for d, v in zip(dates, vals):
            rows.append({"date": d.strftime("%Y-%m-%d"), "id": f"S{j:02d}", "target": float(v)})
    train_csv = tmp_path / "train.csv"
    pd.DataFrame(rows).to_csv(train_csv, index=False)
    test_dir = tmp_path / "test"
    os.makedirs(test_dir)
    tdates = pd.date_range(dates[-1] + pd.Timedelta(days=1), periods=16, freq="D")
    trows = []
    for j in range(N):
        for i, d in enumerate(tdates):
            trows.append(
                {
                    "date": d.strftime("%Y-%m-%d"),
                    "id": f"S{j:02d}",
                    "target": float(5 + 3 * np.sin(2 * math.pi * (T + i + j) / 7)),
                }
            )
    pd.DataFrame(trows).to_csv(test_dir / "TEST_00.csv", index=False)

    cfg = {
        "data": {
            "train_csv": str(train_csv), "test_dir": str(test_dir),
            "date_col": "date", "id_col": "id", "target_col": "target",
            "horizon": 4, "time_features": {"enabled": False},
        },
        "preprocess": {"normalize": "zscore", "clip_negative": True},
        "window": {"input_len": 14, "pred_len": 4},
        "model": {
            "mode": "direct", "input_len": 14, "pred_len": 4, "d_model": 8,
            "d_ff": 16, "n_layers": 1, "k_periods": 1, "min_period_threshold": 2,
            "kernel_set": [[3, 3]], "dropout": 0.0, "id_embed_dim": 2,
        },
        "train": {
            "device": "cpu", "epochs": 1, "batch_size": 16, "lr": 1e-3,
            "lr_warmup_steps": 0,
            "val": {"strategy": "holdout", "holdout_days": 20},
        },
        "artifacts": {"dir": str(tmp_path / "artifacts")},
        "submission": {"out_path": str(tmp_path / "sub_whole.csv"), "format": "row_key"},
        "tuning": {"seed": 5},
    }
    train_once(PipelineConfig.from_mapping(cfg))
    whole = pd.read_csv(predict_once(PipelineConfig.from_mapping(cfg)))

    cfg["predict"] = {"chunk_rows": 7}  # 24 rows -> 3 full chunks + padded tail
    cfg["submission"]["out_path"] = str(tmp_path / "sub_chunked.csv")
    chunked = pd.read_csv(predict_once(PipelineConfig.from_mapping(cfg)))

    assert list(whole.columns) == list(chunked.columns)
    np.testing.assert_allclose(
        whole.iloc[:, 1:].to_numpy(float),
        chunked.iloc[:, 1:].to_numpy(float),
        rtol=1e-5, atol=1e-5,
    )


def test_resolve_chunk_rows():
    from flow_timesnet_tpu.predict import _resolve_chunk_rows

    assert _resolve_chunk_rows(None, 100, 1) is None          # auto, small N
    assert _resolve_chunk_rows({}, 10_000, 1) == 2048         # auto, large N
    assert _resolve_chunk_rows({"chunk_rows": "off"}, 10_000, 1) is None
    assert _resolve_chunk_rows({"chunk_rows": 512}, 10_000, 1) == 512
    assert _resolve_chunk_rows({"chunk_rows": 500}, 10_000, 8) == 504  # mesh multiple
    assert _resolve_chunk_rows({"chunk_rows": 512}, 300, 1) is None    # covers N
