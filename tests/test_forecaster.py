"""Serving API: Forecaster.from_artifacts + programmatic forecasts."""

import math

import numpy as np
import pandas as pd
import pytest

from flow_timesnet_tpu.config import PipelineConfig
from flow_timesnet_tpu.forecaster import Forecaster
from flow_timesnet_tpu.train import train_once


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("serve")
    rng = np.random.default_rng(0)
    T = 70
    dates = pd.date_range("2024-01-01", periods=T, freq="D")
    frames = {}
    rows = []
    for j in range(3):
        vals = np.maximum(
            np.round(5 + j + 2 * np.sin(2 * math.pi * np.arange(T) / 7) + rng.normal(0, 0.3, T)),
            0,
        )
        frames[f"S{j}_menu"] = vals
        for d, v in zip(dates, vals):
            rows.append({"date": d.strftime("%Y-%m-%d"), "id": f"S{j}_menu", "target": float(v)})
    train_csv = tmp_path / "train.csv"
    pd.DataFrame(rows).to_csv(train_csv, index=False)
    cfg = {
        "data": {
            "train_csv": str(train_csv), "date_col": "date", "id_col": "id",
            "target_col": "target",
            "time_features": {"enabled": True, "features": ["day_of_week"],
                              "encoding": "cyclical", "normalize": True},
        },
        "preprocess": {"normalize": "zscore", "normalize_per_series": True,
                       "eps": 1e-8, "clip_negative": True},
        "window": {"input_len": 14, "pred_len": 5},
        "model": {
            "mode": "direct", "input_len": 14, "pred_len": 5, "d_model": 8,
            "d_ff": 16, "n_layers": 1, "k_periods": 2, "min_period_threshold": 2,
            "kernel_set": [[3, 3]], "dropout": 0.0, "id_embed_dim": 4,
            "static_proj_dim": 4, "use_zero_mean_context": True, "context_rank": 2,
        },
        "train": {
            "device": "cpu", "epochs": 2, "batch_size": 16, "lr": 1e-3,
            "lr_warmup_steps": 0, "use_loss_masking": True,
            "min_sigma_method": "per_series_median", "min_sigma_scale": 0.05,
            "val": {"strategy": "holdout", "holdout_days": 24},
        },
        "artifacts": {"dir": str(tmp_path / "artifacts")},
        "tuning": {"seed": 4},
    }
    train_once(PipelineConfig.from_mapping(cfg))
    history = pd.DataFrame(frames, index=dates)
    return tmp_path / "artifacts", history


def test_forecaster_dataframe_round_trip(artifacts):
    art_dir, history = artifacts
    fc = Forecaster.from_artifacts(str(art_dir))
    assert fc.input_len == 14 and fc.pred_len == 5
    out = fc.forecast(history)
    assert isinstance(out, pd.DataFrame)
    assert out.shape == (5, 3)
    assert list(out.columns) == list(history.columns)
    assert (out.index[0] - history.index[-1]).days == 1
    vals = out.to_numpy()
    assert np.all(np.isfinite(vals)) and np.all(vals >= 0)
    # forecasts should land near the recent level of each series
    recent = history.tail(14).mean().to_numpy()
    assert np.all(np.abs(vals.mean(axis=0) - recent) < 5.0)


def test_forecaster_subset_and_dispersion(artifacts):
    art_dir, history = artifacts
    fc = Forecaster.from_artifacts(str(art_dir))
    subset = ["S2_menu", "S0_menu"]
    out, disp = fc.forecast(history[subset], return_dispersion=True)
    assert out.shape == (5, 2)
    assert disp.shape == (5, 2)
    assert np.all(disp > 0)
    # column order follows the request, and values match the full forecast
    full = fc.forecast(history)
    np.testing.assert_allclose(out["S2_menu"].to_numpy(),
                               full["S2_menu"].to_numpy(), rtol=1e-5)


def test_forecaster_errors(artifacts):
    art_dir, history = artifacts
    fc = Forecaster.from_artifacts(str(art_dir))
    with pytest.raises(KeyError, match="Unknown series"):
        fc.forecast(history.rename(columns={"S0_menu": "nope"}))
    with pytest.raises(ValueError, match="history length"):
        fc.forecast(history.tail(5))
    with pytest.raises(ValueError, match="direct mode"):
        fc.forecast(history, horizon=9)
    with pytest.raises(ValueError, match="DatetimeIndex"):
        fc.forecast(history.to_numpy(), series=list(history.columns))


def test_evaluate_once(artifacts, tmp_path):
    from flow_timesnet_tpu.evaluate import evaluate_once

    art_dir, history = artifacts
    train_csv = art_dir.parent / "train.csv"
    cfg = {
        "data": {
            "train_csv": str(train_csv), "date_col": "date", "id_col": "id",
            "target_col": "target",
            "time_features": {"enabled": True, "features": ["day_of_week"],
                              "encoding": "cyclical", "normalize": True},
        },
        "preprocess": {"normalize": "zscore", "clip_negative": True},
        "window": {"input_len": 14, "pred_len": 5},
        "model": {"input_len": 14, "pred_len": 5, "kernel_set": [[3, 3]]},
        "train": {"batch_size": 32, "use_loss_masking": True,
                  "val": {"strategy": "holdout", "holdout_days": 24}},
        "artifacts": {"dir": str(art_dir)},
        "evaluation": {"out_path": str(tmp_path / "eval.json")},
    }
    result = evaluate_once(cfg)
    assert np.isfinite(result["nll"])
    assert 0.0 <= result["smape"] <= 2.0
    assert result["windows"] > 0
    import json

    with open(tmp_path / "eval.json") as f:
        saved = json.load(f)
    assert saved["nll"] == pytest.approx(result["nll"])


def test_forecast_quantiles_monotone(artifacts):
    art_dir, history = artifacts
    fc = Forecaster.from_artifacts(str(art_dir))
    qs = fc.forecast_quantiles(history, quantiles=(0.1, 0.5, 0.9))
    assert set(qs) == {0.1, 0.5, 0.9}
    q10 = qs[0.1].to_numpy()
    q50 = qs[0.5].to_numpy()
    q90 = qs[0.9].to_numpy()
    assert np.all(q10 <= q50) and np.all(q50 <= q90)
    assert np.all(q90 >= 0)
    # the median should track the mean forecast to within the count scale
    mean = fc.forecast(history).to_numpy()
    assert np.all(np.abs(q50 - mean) <= np.maximum(3.0, mean))


def test_forecast_quantiles_zscore_spread(artifacts):
    """Quantiles must be computed in model space, then inverse-transformed.

    Under a zscore scaler the NB2 variance relation Var = mu + alpha*mu^2
    holds for the *model-space* mean; pairing the original-units mean with
    the model-space dispersion (the old serving-path bug) yields a completely
    different spread. Oracle: q90 - q50 == std_series * z_0.9 * sd_model.
    """

    from flow_timesnet_tpu.data.pivot import scaler_arrays
    from flow_timesnet_tpu.utils.quantiles import normal_ppf

    art_dir, history = artifacts
    fc = Forecaster.from_artifacts(str(art_dir))
    assert fc.method == "zscore"
    qs = fc.forecast_quantiles(history, quantiles=(0.5, 0.9), method="normal")
    mu_z, alpha, columns, _ = fc._forecast_raw(history)
    mu_c = np.clip(mu_z, 1e-8, None)
    sd_z = np.sqrt(mu_c + alpha * mu_c**2)
    _, scale = scaler_arrays(list(columns), fc.scaler, fc.method)
    expected = normal_ppf(0.9) * sd_z * scale[None, :]
    got = qs[0.9].to_numpy() - qs[0.5].to_numpy()
    m = qs[0.5].to_numpy() > 0  # rows where neither side hit the final clip
    assert m.any()
    np.testing.assert_allclose(got[m], expected[m], rtol=1e-4, atol=1e-5)
