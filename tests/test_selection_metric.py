"""``train.selection_metric`` and ``tuning.objective``.

The reference keys checkpoint selection and early stopping on val NLL only
(``/root/reference/src/timesnet_forecast/train.py:1536-1571``); the ``smape``
option exists because the measured val-NLL <-> test-sMAPE correlation inverts
under EMA weight averaging (BENCHMARKS.md). These tests script the evaluator
so the two metrics disagree about which epoch is best, then assert selection,
early stopping, the persisted train-state payload and the tuner objective all
follow the configured metric.
"""

import math
import os

import numpy as np
import pandas as pd
import pytest

from flow_timesnet_tpu.config import PipelineConfig
from flow_timesnet_tpu.engine import Engine
from flow_timesnet_tpu.train import train_once
from flow_timesnet_tpu.utils import artifacts as artifacts_io


def _write_dataset(tmp_path):
    rng = np.random.default_rng(0)
    T = 40
    dates = pd.date_range("2024-01-01", periods=T, freq="D")
    rows = []
    for j in range(2):
        vals = np.maximum(
            np.round(4 + 2 * np.sin(2 * math.pi * np.arange(T) / 7) + rng.normal(0, 0.3, T)),
            0,
        )
        for d, v in zip(dates, vals):
            rows.append({"date": d.strftime("%Y-%m-%d"), "id": f"S{j}", "target": float(v)})
    train_csv = tmp_path / "train.csv"
    pd.DataFrame(rows).to_csv(train_csv, index=False)
    return train_csv


def _cfg(tmp_path, train_csv, **train_overrides):
    train = {
        "device": "cpu", "epochs": 3, "batch_size": 8, "lr": 1e-3,
        "lr_warmup_steps": 0, "save_train_state": True,
        "val": {"strategy": "holdout", "holdout_days": 16},
    }
    train.update(train_overrides)
    return {
        "data": {
            "train_csv": str(train_csv),
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
        "train": train,
        "artifacts": {"dir": str(tmp_path / "artifacts")},
        "submission": {"out_path": str(tmp_path / "sub.csv"), "format": "row_key"},
        "tuning": {"seed": 1},
    }


# epoch ->        1     2     3        argmin: nll=2, smape=3
_NLL = [3.0, 2.0, 2.5]
_SMAPE = [0.9, 0.8, 0.1]


def _script_evaluator(monkeypatch):
    calls = {"n": 0}

    def fake_eval(self, params, *args, **kwargs):
        i = min(calls["n"], len(_NLL) - 1)
        calls["n"] += 1
        return {
            "nll": _NLL[i],
            "smape": _SMAPE[i],
            "series_sums": np.zeros(2, np.float64),
            "series_cnts": np.zeros(2, np.float64),
        }

    monkeypatch.setattr(Engine, "evaluate", fake_eval)
    monkeypatch.setattr(Engine, "evaluate_resident", fake_eval)
    return calls


def _load_extra(tmp_path):
    # payload-only peek: state template is not needed for the extras
    import msgpack  # noqa: F401  (flax serialization used underneath)
    from flax import serialization

    with open(tmp_path / "artifacts" / "train_state.msgpack", "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    return payload["extra"] if "extra" in payload else payload


def test_selection_nll_default(tmp_path, monkeypatch):
    train_csv = _write_dataset(tmp_path)
    _script_evaluator(monkeypatch)
    best_nll, info = train_once(PipelineConfig.from_mapping(_cfg(tmp_path, train_csv)))
    assert best_nll == pytest.approx(2.0)
    assert info["metrics"]["smape"] == pytest.approx(0.8)  # value AT the nll-best epoch


def test_selection_smape(tmp_path, monkeypatch):
    train_csv = _write_dataset(tmp_path)
    _script_evaluator(monkeypatch)
    best_nll, info = train_once(
        PipelineConfig.from_mapping(_cfg(tmp_path, train_csv, selection_metric="smape"))
    )
    # epoch 3 selected: nll/smape reported at that epoch
    assert best_nll == pytest.approx(2.5)
    assert info["metrics"]["smape"] == pytest.approx(0.1)


def test_selection_smape_early_stop_and_state(tmp_path, monkeypatch):
    """Patience counts non-improving epochs of the SELECTED metric, and the
    persisted train-state extras record the selection value."""

    train_csv = _write_dataset(tmp_path)
    _script_evaluator(monkeypatch)
    # smape improves every epoch -> patience 0 never trips despite NLL
    # worsening at epoch 3
    best_nll, info = train_once(
        PipelineConfig.from_mapping(
            _cfg(
                tmp_path, train_csv,
                selection_metric="smape", early_stopping_patience=0,
            )
        )
    )
    assert info["metrics"]["smape"] == pytest.approx(0.1)  # reached epoch 3
    extra = _load_extra(tmp_path)
    assert float(extra["best_sel"]) == pytest.approx(0.1)
    assert int(extra["best_epoch"]) == 3
    assert int(extra["epoch"]) == 3


def test_selection_metric_rejects_unknown(tmp_path, monkeypatch):
    train_csv = _write_dataset(tmp_path)
    with pytest.raises(ValueError, match="selection_metric"):
        train_once(
            PipelineConfig.from_mapping(
                _cfg(tmp_path, train_csv, selection_metric="wsmape")
            )
        )


def test_tune_objective_val_smape(tmp_path, monkeypatch):
    """The tuner ranks trials by the configured objective."""

    from flow_timesnet_tpu import tune as tune_mod

    # two fake trials: trial A best by nll, trial B best by smape
    outcomes = {
        0.001: (1.0, 0.9),  # lr=0.001 -> nll 1.0, smape 0.9
        0.002: (2.0, 0.2),  # lr=0.002 -> nll 2.0, smape 0.2
    }

    def fake_train_once(cfg, epoch_hook=None):
        lr = round(float(cfg.raw["train"]["lr"]), 6)
        nll, smape = outcomes[lr]
        return nll, {"metrics": {"nll": nll, "smape": smape, "wsmape": smape}}

    monkeypatch.setattr(tune_mod, "train_once", fake_train_once)
    space = tmp_path / "space.yaml"
    space.write_text("train.lr: {choices: [0.001, 0.002], type: categorical}\n")

    base = _cfg(tmp_path, _write_dataset(tmp_path))
    base["tuning"] = {"seed": 1, "n_trials": 4, "objective": "val_smape",
                      "sampler": "random"}
    result = tune_mod.tune(
        PipelineConfig.from_mapping(base), str(space), out_dir=str(tmp_path / "tuneout")
    )
    assert result["best_params"]["train.lr"] == pytest.approx(0.002)
    assert result["best_value"] == pytest.approx(0.2)

    base["tuning"]["objective"] = "val_nll"
    result = tune_mod.tune(
        PipelineConfig.from_mapping(base), str(space), out_dir=str(tmp_path / "tuneout2")
    )
    assert result["best_params"]["train.lr"] == pytest.approx(0.001)
    assert result["best_value"] == pytest.approx(1.0)

    import json

    payload = json.load(open(tmp_path / "tuneout" / "best_params.json"))
    assert payload["objective"] == "val_smape"


def test_tune_objective_rejects_unknown(tmp_path):
    from flow_timesnet_tpu import tune as tune_mod

    space = tmp_path / "space.yaml"
    space.write_text("train.lr: {choices: [0.001], type: categorical}\n")
    base = _cfg(tmp_path, _write_dataset(tmp_path))
    base["tuning"] = {"seed": 1, "n_trials": 1, "objective": "wsmape"}
    with pytest.raises(ValueError, match="tuning.objective"):
        tune_mod.tune(PipelineConfig.from_mapping(base), str(space))
