"""Bundled demand-data recipe (BASELINE configs #2/#3).

``data/train.csv`` is absent from the reference mount, so a synthetic history
with the real 193-series id set (taken from ``TEST_00.csv``) stands in.
Exercises: Korean schema detection, the full train_once pipeline, prediction
over the real bundled ``TEST_0*.csv`` files, and a submission matching
``sample_submission.csv`` in shape/columns/row keys — for both direct and
recursive decoding from their own checkpoints.
"""

import os

import numpy as np
import pandas as pd
import pytest

from flow_timesnet_tpu.config import PipelineConfig
from flow_timesnet_tpu.predict import predict_once
from flow_timesnet_tpu.train import train_once

REF_DATA = "/root/reference/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_DATA, "test")), reason="bundled data missing"
)


def _synth_train_csv(path, ids, T=90, seed=0):
    rng = np.random.default_rng(seed)
    dates = pd.date_range("2024-03-01", periods=T, freq="D")
    frames = []
    t = np.arange(T)
    for j, sid in enumerate(ids):
        base = 3 + (j % 7) + 2.0 * np.sin(2 * np.pi * (t + j) / 7.0)
        vals = np.maximum(np.round(base + rng.normal(0, 0.5, T)), 0)
        frames.append(
            pd.DataFrame(
                {"영업일자": dates.strftime("%Y-%m-%d"), "영업장명_메뉴명": sid, "매출수량": vals}
            )
        )
    pd.concat(frames).to_csv(path, index=False, encoding="utf-8-sig")


def _recipe_cfg(tmp_path, train_csv, mode, out_name):
    return {
        "data": {
            "train_csv": str(train_csv),
            "test_dir": os.path.join(REF_DATA, "test"),
            "sample_submission": os.path.join(REF_DATA, "sample_submission.csv"),
            "date_col": "영업일자",
            "id_col": "영업장명_메뉴명",
            "target_col": "매출수량",
            "horizon": 7,
            "fill_missing_dates": True,
            "encoding": "utf-8-sig",
            "time_features": {
                "enabled": True,
                "features": ["day_of_week", "month"],
                "encoding": "cyclical",
                "normalize": True,
            },
        },
        "preprocess": {"normalize": "none", "clip_negative": True},
        "window": {"input_len": 28, "pred_len": 7, "short_series_strategy": "repeat"},
        "model": {
            "mode": mode,
            "input_len": 28,
            "pred_len": 7,
            "d_model": 16,
            "d_ff": 32,
            "n_layers": 1,
            "k_periods": 2,
            "min_period_threshold": 4,
            "kernel_set": [[3, 3]],
            "dropout": 0.0,
            "activation": "gelu",
            "bottleneck_ratio": 2.0,
            "id_embed_dim": 8,
            "static_proj_dim": 8,
            "use_zero_mean_context": True,
            "context_rank": 4,
            "context_scale": 0.05,
        },
        "train": {
            "device": "cpu",
            "epochs": 1,
            "batch_size": 256,
            "lr": 1e-3,
            "lr_warmup_steps": 0,
            "use_loss_masking": True,
            "min_sigma_method": "per_series_median",
            "min_sigma_scale": 0.05,
            "val": {"strategy": "holdout", "holdout_days": 35},
        },
        "artifacts": {"dir": str(tmp_path / f"artifacts_{mode}")},
        "submission": {
            "out_path": str(tmp_path / out_name),
            "format": "row_key",
        },
        "tuning": {"seed": 3},
    }


@pytest.fixture(scope="module")
def bundled_ids():
    df = pd.read_csv(os.path.join(REF_DATA, "test", "TEST_00.csv"), encoding="utf-8-sig")
    return sorted(df["영업장명_메뉴명"].unique().tolist())


@pytest.mark.parametrize("mode", ["direct", "recursive"])
def test_bundled_recipe_submission(tmp_path, bundled_ids, mode):
    train_csv = tmp_path / "train.csv"
    _synth_train_csv(train_csv, bundled_ids)
    cfg = _recipe_cfg(tmp_path, train_csv, mode, f"submission_{mode}.csv")
    best_nll, _ = train_once(PipelineConfig.from_mapping(cfg))
    assert np.isfinite(best_nll)

    out_path = predict_once(PipelineConfig.from_mapping(cfg))
    sub = pd.read_csv(out_path, encoding="utf-8-sig")
    sample = pd.read_csv(
        os.path.join(REF_DATA, "sample_submission.csv"), encoding="utf-8-sig"
    )
    # shape/column/row-key compatibility with the bundled sample
    assert sub.shape == sample.shape
    assert list(sub.columns) == list(sample.columns)
    assert list(sub.iloc[:, 0]) == list(sample.iloc[:, 0])
    values = sub.iloc[:, 1:].to_numpy(dtype=float)
    assert np.all(np.isfinite(values))
    assert np.all(values >= 0)
    assert values.sum() > 0
