"""Deep-ensemble prediction: ``predict.ensemble_dirs``.

No reference analogue (the reference predicts from exactly one checkpoint,
``/root/reference/src/timesnet_forecast/predict.py:345``); the contract
tested here is the one BENCHMARKS.md's ensemble row relies on: the final
submission is the cell-wise mean (or median) of the member submissions the
single-model path would have rendered, with every alignment guard intact.
"""

import math
import os

import numpy as np
import pandas as pd
import pytest

from flow_timesnet_tpu.config import PipelineConfig
from flow_timesnet_tpu.predict import predict_once
from flow_timesnet_tpu.train import train_once


def _write_dataset(tmp_path):
    rng = np.random.default_rng(0)
    T = 40
    dates = pd.date_range("2024-01-01", periods=T, freq="D")
    rows = []
    for j in range(3):
        vals = np.maximum(
            np.round(
                4 + 2 * math.sin(0.0) + 2 * np.sin(2 * math.pi * np.arange(T) / 7)
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
    tdates = pd.date_range(dates[-1] + pd.Timedelta(days=1), periods=15, freq="D")
    trows = []
    for j in range(3):
        for d in tdates:
            trows.append({"date": d.strftime("%Y-%m-%d"), "id": f"S{j}", "target": 3.0})
    pd.DataFrame(trows).to_csv(test_dir / "TEST_00.csv", index=False)
    return train_csv, test_dir


def _base_cfg(tmp_path, train_csv, test_dir, art_dir, out_path, seed):
    return {
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
        },
        "train": {
            "device": "cpu", "epochs": 1, "batch_size": 8, "lr": 1e-3,
            "lr_warmup_steps": 0,
            "val": {"strategy": "holdout", "holdout_days": 16},
        },
        "artifacts": {"dir": str(art_dir)},
        "submission": {"out_path": str(out_path), "format": "row_key"},
        "tuning": {"seed": seed},
    }


@pytest.fixture(scope="module")
def trained_members(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("ensemble")
    train_csv, test_dir = _write_dataset(tmp_path)
    member_dirs = []
    for i, seed in enumerate((1, 2, 3)):
        art = tmp_path / f"artifacts_{i}"
        cfg = _base_cfg(tmp_path, train_csv, test_dir, art, tmp_path / f"sub_{i}.csv", seed)
        train_once(PipelineConfig.from_mapping(cfg))
        member_dirs.append(str(art))
    return tmp_path, train_csv, test_dir, member_dirs


def test_ensemble_mean_matches_member_average(trained_members):
    tmp_path, train_csv, test_dir, member_dirs = trained_members
    out = tmp_path / "ens.csv"
    cfg = _base_cfg(tmp_path, train_csv, test_dir, member_dirs[0], out, 1)
    cfg["predict"] = {"ensemble_dirs": member_dirs[1:]}
    path = predict_once(PipelineConfig.from_mapping(cfg))
    assert path == str(out)
    ens = pd.read_csv(path, encoding="utf-8-sig")

    members = [
        pd.read_csv(f"{out}.member{i}.csv", encoding="utf-8-sig") for i in range(3)
    ]
    # the member files are the single-model submissions, and members differ
    assert all(list(m.columns) == list(ens.columns) for m in members)
    m_vals = np.stack([m.iloc[:, 1:].to_numpy(float) for m in members])
    assert np.ptp(m_vals, axis=0).max() > 0  # seeds actually disagree somewhere
    np.testing.assert_allclose(
        ens.iloc[:, 1:].to_numpy(float), m_vals.mean(axis=0), rtol=0, atol=1e-9
    )

    # each member file matches a standalone single-model predict
    solo = tmp_path / "solo.csv"
    cfg_solo = _base_cfg(tmp_path, train_csv, test_dir, member_dirs[1], solo, 2)
    predict_once(PipelineConfig.from_mapping(cfg_solo))
    pd.testing.assert_frame_equal(
        pd.read_csv(solo, encoding="utf-8-sig"), members[1]
    )


def test_ensemble_median_reduce(trained_members):
    tmp_path, train_csv, test_dir, member_dirs = trained_members
    out = tmp_path / "ens_med.csv"
    cfg = _base_cfg(tmp_path, train_csv, test_dir, member_dirs[0], out, 1)
    cfg["predict"] = {"ensemble_dirs": member_dirs[1:], "ensemble_reduce": "median"}
    path = predict_once(PipelineConfig.from_mapping(cfg))
    ens = pd.read_csv(path, encoding="utf-8-sig")
    m_vals = np.stack(
        [
            pd.read_csv(f"{out}.member{i}.csv", encoding="utf-8-sig")
            .iloc[:, 1:]
            .to_numpy(float)
            for i in range(3)
        ]
    )
    np.testing.assert_allclose(
        ens.iloc[:, 1:].to_numpy(float), np.median(m_vals, axis=0), rtol=0, atol=1e-9
    )


def test_ensemble_mixed_architecture_uses_member_config(trained_members):
    """Members trained at different capacities ensemble cleanly.

    The runtime config carries one model section; each member must forward
    through its OWN stored architecture (predict.ensemble_member_model
    defaults to 'member'), because submissions — not parameters — are what
    get averaged.
    """
    tmp_path, train_csv, test_dir, member_dirs = trained_members
    wide_art = tmp_path / "artifacts_wide"
    cfg_wide = _base_cfg(
        tmp_path, train_csv, test_dir, wide_art, tmp_path / "sub_wide.csv", 4
    )
    cfg_wide["model"]["d_model"] = 16
    cfg_wide["model"]["d_ff"] = 32
    train_once(PipelineConfig.from_mapping(cfg_wide))

    out = tmp_path / "ens_mixed.csv"
    # runtime config says d_model=8; the wide member must still load.
    cfg = _base_cfg(tmp_path, train_csv, test_dir, member_dirs[0], out, 1)
    cfg["predict"] = {"ensemble_dirs": [str(wide_art)]}
    path = predict_once(PipelineConfig.from_mapping(cfg))
    ens = pd.read_csv(path, encoding="utf-8-sig")
    m_vals = np.stack(
        [
            pd.read_csv(f"{out}.member{i}.csv", encoding="utf-8-sig")
            .iloc[:, 1:]
            .to_numpy(float)
            for i in range(2)
        ]
    )
    np.testing.assert_allclose(
        ens.iloc[:, 1:].to_numpy(float), m_vals.mean(axis=0), rtol=0, atol=1e-9
    )

    # 'runtime' restores override-wins: the wide member now trips signature
    # validation against the runtime d_model=8.
    cfg_rt = _base_cfg(tmp_path, train_csv, test_dir, member_dirs[0], out, 1)
    cfg_rt["predict"] = {
        "ensemble_dirs": [str(wide_art)],
        "ensemble_member_model": "runtime",
    }
    with pytest.raises(ValueError):
        predict_once(PipelineConfig.from_mapping(cfg_rt))


def test_ensemble_requires_second_member(trained_members):
    tmp_path, train_csv, test_dir, member_dirs = trained_members
    cfg = _base_cfg(
        tmp_path, train_csv, test_dir, member_dirs[0], tmp_path / "x.csv", 1
    )
    cfg["predict"] = {"ensemble_dirs": [member_dirs[0]]}  # duplicate of base
    with pytest.raises(ValueError, match="at least one artifact directory"):
        predict_once(PipelineConfig.from_mapping(cfg))


def test_ensemble_rejects_unknown_reduce(trained_members):
    tmp_path, train_csv, test_dir, member_dirs = trained_members
    cfg = _base_cfg(
        tmp_path, train_csv, test_dir, member_dirs[0], tmp_path / "y.csv", 1
    )
    cfg["predict"] = {"ensemble_dirs": member_dirs[1:], "ensemble_reduce": "max"}
    with pytest.raises(ValueError, match="ensemble_reduce"):
        predict_once(PipelineConfig.from_mapping(cfg))
