"""Full pipeline integration: train_once -> artifacts -> predict_once -> submission.

Mirrors the reference integration patterns (``tests/test_clip_negative.py``,
``tests/test_predict_static_checkpoint.py``): tiny synthetic long-format CSV,
a short training run, then an inference round-trip whose submission must be
shape/column-compatible and whose values match a direct engine call.
"""

import math
import os

import numpy as np
import pandas as pd
import pytest

from flow_timesnet_tpu.config import PipelineConfig
from flow_timesnet_tpu.predict import predict_once
from flow_timesnet_tpu.train import train_once


def _write_long_csv(path, T=60, n_series=3, seed=0):
    rng = np.random.default_rng(seed)
    dates = pd.date_range("2024-01-01", periods=T, freq="D")
    rows = []
    for j in range(n_series):
        base = 5 + j + 2.0 * np.sin(2 * math.pi * np.arange(T) / 7.0)
        noise = rng.normal(0, 0.3, T)
        vals = np.maximum(np.round(base + noise), 0)
        for d, v in zip(dates, vals):
            rows.append({"date": d.strftime("%Y-%m-%d"), "id": f"S{j}_item", "target": float(v)})
    pd.DataFrame(rows).to_csv(path, index=False)
    return dates


def _cfg_dict(tmp_path, train_csv, test_dir, sample_path):
    return {
        "data": {
            "train_csv": str(train_csv),
            "test_dir": str(test_dir),
            "sample_submission": str(sample_path),
            "date_col": "date",
            "id_col": "id",
            "target_col": "target",
            "fill_missing_dates": True,
            "encoding": "utf-8",
            "horizon": 4,
            "time_features": {
                "enabled": True,
                "features": ["day_of_week", "month"],
                "encoding": "cyclical",
                "normalize": True,
            },
        },
        "preprocess": {"normalize": "zscore", "normalize_per_series": True,
                       "eps": 1e-8, "clip_negative": True},
        "window": {"input_len": 16, "pred_len": 4, "stride": 1,
                   "short_series_strategy": "repeat"},
        "model": {
            "mode": "direct",
            "input_len": 16,
            "pred_len": 4,
            "d_model": 8,
            "d_ff": 16,
            "n_layers": 1,
            "k_periods": 2,
            "min_period_threshold": 2,
            "kernel_set": [[3, 3]],
            "dropout": 0.0,
            "activation": "gelu",
            "bottleneck_ratio": 1.0,
            "id_embed_dim": 4,
            "static_proj_dim": 4,
            "use_zero_mean_context": True,
            "context_rank": 2,
            "context_scale": 0.05,
        },
        "train": {
            "device": "cpu",
            "epochs": 2,
            "batch_size": 8,
            "lr": 1e-3,
            "lr_warmup_steps": 0,
            "weight_decay": 0.0,
            "grad_clip_norm": 1.0,
            "use_loss_masking": True,
            "min_sigma": 1e-3,
            "min_sigma_method": "per_series_median",
            "min_sigma_scale": 0.05,
            "val": {"strategy": "holdout", "holdout_days": 24},
        },
        "artifacts": {"dir": str(tmp_path / "artifacts")},
        "submission": {
            "out_path": str(tmp_path / "submission.csv"),
            "format": "row_key",
        },
        "tuning": {"seed": 7},
    }


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("pipeline")
    train_csv = tmp_path / "train.csv"
    dates = _write_long_csv(train_csv)
    test_dir = tmp_path / "test"
    os.makedirs(test_dir, exist_ok=True)
    # two test files: one full, one missing a series
    rng = np.random.default_rng(5)
    for t_idx, series in enumerate((["S0_item", "S1_item", "S2_item"], ["S0_item", "S2_item"])):
        rows = []
        tdates = pd.date_range(dates[-1] + pd.Timedelta(days=1), periods=20, freq="D")
        for sid in series:
            vals = np.maximum(rng.normal(6, 1, len(tdates)).round(), 0)
            for d, v in zip(tdates, vals):
                rows.append({"date": d.strftime("%Y-%m-%d"), "id": sid, "target": float(v)})
        pd.DataFrame(rows).to_csv(test_dir / f"TEST_{t_idx:02d}.csv", index=False)
    # sample submission with row keys + original (unnormalised) headers
    row_keys = [f"TEST_{i:02d}+D{d}" for i in range(2) for d in range(1, 5)]
    sample = pd.DataFrame({"row_key": row_keys})
    for sid in ["S0_item", "S1_item", "S2_item"]:
        sample[sid] = 0.0
    sample_path = tmp_path / "sample_submission.csv"
    sample.to_csv(sample_path, index=False)

    cfg = _cfg_dict(tmp_path, train_csv, test_dir, sample_path)
    best_nll, paths = train_once(PipelineConfig.from_mapping(cfg))
    return tmp_path, cfg, best_nll, paths


def test_train_once_emits_artifacts(trained):
    tmp_path, cfg, best_nll, paths = trained
    art = tmp_path / "artifacts"
    assert np.isfinite(best_nll)
    for name in (
        "timesnet.msgpack",
        "scaler.pkl",
        "schema.json",
        "config_used.yaml",
        "metadata.json",
        "model_signature.json",
    ):
        assert (art / name).exists(), name
    import pickle

    with open(art / "scaler.pkl", "rb") as f:
        scaler_meta = pickle.load(f)
    assert scaler_meta["ids"] == ["S0_item", "S1_item", "S2_item"]
    assert scaler_meta["method"] == "zscore"
    assert scaler_meta["feature_names"] == [
        "mean",
        "std",
        "diff_std",
        "seasonal_strength",
        "dominant_period",
    ]
    assert scaler_meta["static_features"].shape == (3, 5)
    assert scaler_meta["time_features"]["enabled"] is True
    assert scaler_meta["time_features"]["feature_dim"] == 4


def test_predict_once_round_trip(trained):
    tmp_path, cfg, _, _ = trained
    out_path = predict_once(PipelineConfig.from_mapping(cfg))
    sub = pd.read_csv(out_path)
    assert list(sub.columns) == ["row_key", "S0_item", "S1_item", "S2_item"]
    assert len(sub) == 8
    values = sub[["S0_item", "S1_item", "S2_item"]].to_numpy()
    assert np.all(np.isfinite(values))
    assert np.all(values >= 0.0)
    # TEST_01 lacks S1_item -> prediction columns hold the inverse-transformed
    # zero, i.e. the series' training mean under zscore (same contract as the
    # reference, predict.py:956-961)
    import pickle

    with open(tmp_path / "artifacts" / "scaler.pkl", "rb") as f:
        scaler_meta = pickle.load(f)
    mu_s1 = scaler_meta["scaler"]["S1_item"][0]
    t1 = sub[sub["row_key"].str.startswith("TEST_01")]
    assert np.allclose(t1["S1_item"].to_numpy(), mu_s1, atol=1e-4)
    # present series must produce non-trivial forecasts
    assert float(np.abs(values[:4]).sum()) > 0.0


def test_predict_date_menu_format(trained):
    tmp_path, cfg, _, _ = trained
    cfg2 = {**cfg, "submission": {
        "out_path": str(tmp_path / "submission_date.csv"),
        "format": "date_menu",
        "date_col": "date",
    }}
    out_path = predict_once(PipelineConfig.from_mapping(cfg2))
    sub = pd.read_csv(out_path)
    assert list(sub.columns)[0] == "date"
    assert len(sub) == 8


def test_metadata_guard_rejects_window_drift(trained):
    tmp_path, cfg, _, _ = trained
    bad = {**cfg}
    bad["window"] = dict(cfg["window"], input_len=12)
    bad["model"] = dict(cfg["model"], input_len=12)
    with pytest.raises(ValueError, match="input_len"):
        predict_once(PipelineConfig.from_mapping(bad))


def test_rolling_cv_training(tmp_path):
    """Rolling-CV validation strategy (the reference default): multiple folds,
    leak-free scaler fit on the first train fold."""

    train_csv = tmp_path / "train.csv"
    _write_long_csv(train_csv, T=80)
    cfg = _cfg_dict(tmp_path, train_csv, tmp_path, tmp_path / "none.csv")
    cfg["train"]["val"] = {
        "strategy": "rolling",
        "holdout_days": 24,
        "rolling_folds": 3,
        "rolling_step_days": 7,
    }
    cfg["train"]["epochs"] = 1
    best_nll, paths = train_once(PipelineConfig.from_mapping(cfg))
    assert np.isfinite(best_nll)
    # scaler was fit on the first fold's training slice only: transform of
    # that slice must have ~zero mean under zscore
    import pickle

    with open(tmp_path / "artifacts" / "scaler.pkl", "rb") as f:
        meta = pickle.load(f)
    assert meta["method"] == "zscore"
    assert set(meta["scaler"]) == {"S0_item", "S1_item", "S2_item"}
