"""Mid-training resume: interrupted run + resume == uninterrupted run."""

import math
import os

import numpy as np
import pandas as pd
import pytest

from flow_timesnet_tpu.config import PipelineConfig
from flow_timesnet_tpu.train import train_once


def _make_csv(path, T=60, seed=0):
    rng = np.random.default_rng(seed)
    dates = pd.date_range("2024-01-01", periods=T, freq="D")
    rows = []
    for j in range(2):
        vals = np.maximum(
            np.round(4 + j + 2 * np.sin(2 * math.pi * np.arange(T) / 7) + rng.normal(0, 0.3, T)),
            0,
        )
        for d, v in zip(dates, vals):
            rows.append({"date": d.strftime("%Y-%m-%d"), "id": f"S{j}", "target": float(v)})
    pd.DataFrame(rows).to_csv(path, index=False)


def _cfg(tmp_path, train_csv, epochs, resume=False):
    return {
        "data": {
            "train_csv": str(train_csv),
            "date_col": "date",
            "id_col": "id",
            "target_col": "target",
            "time_features": {"enabled": False},
        },
        "preprocess": {"normalize": "none", "clip_negative": True},
        "window": {"input_len": 14, "pred_len": 4},
        "model": {
            "mode": "direct", "input_len": 14, "pred_len": 4, "d_model": 8,
            "d_ff": 16, "n_layers": 1, "k_periods": 2, "min_period_threshold": 2,
            "kernel_set": [[3, 3]], "dropout": 0.0, "id_embed_dim": 4,
            "static_proj_dim": 4,
        },
        "train": {
            "device": "cpu", "epochs": epochs, "batch_size": 8, "lr": 1e-3,
            "lr_warmup_steps": 0, "use_loss_masking": True, "resume": resume,
            "save_train_state": True,
            # pin the cosine horizon so partial and full runs share one schedule
            "lr_scheduler": {"type": "cosine", "T_max": 3, "eta_min": 1e-5},
            "val": {"strategy": "holdout", "holdout_days": 20},
        },
        "artifacts": {"dir": str(tmp_path / "artifacts")},
        "tuning": {"seed": 5},
    }


def test_resume_continues_from_saved_state(tmp_path):
    train_csv = tmp_path / "train.csv"
    _make_csv(train_csv)

    # uninterrupted 3-epoch run
    full_dir = tmp_path / "full"
    cfg_full = _cfg(full_dir, train_csv, epochs=3)
    nll_full, _ = train_once(PipelineConfig.from_mapping(cfg_full))

    # 1 epoch, then resume for 3 total
    cfg_a = _cfg(tmp_path, train_csv, epochs=1)
    train_once(PipelineConfig.from_mapping(cfg_a))
    assert os.path.exists(tmp_path / "artifacts" / "train_state.msgpack")
    cfg_b = _cfg(tmp_path, train_csv, epochs=3, resume=True)
    nll_resumed, _ = train_once(PipelineConfig.from_mapping(cfg_b))

    # identical data order (seeded) + restored optimizer state -> same result
    assert nll_resumed == pytest.approx(nll_full, rel=1e-4)


def test_scan_steps_training_matches_per_step(tmp_path):
    """train.scan_steps chunks must not change results (same seeds, lr, order)."""

    train_csv = tmp_path / "train.csv"
    _make_csv(train_csv)
    cfg_loop = _cfg(tmp_path / "loop", train_csv, epochs=2)
    nll_loop, _ = train_once(PipelineConfig.from_mapping(cfg_loop))
    cfg_scan = _cfg(tmp_path / "scan", train_csv, epochs=2)
    cfg_scan["train"]["scan_steps"] = 3
    nll_scan, _ = train_once(PipelineConfig.from_mapping(cfg_scan))
    assert nll_scan == pytest.approx(nll_loop, rel=1e-5)


def test_train_state_ema_field_migration(tmp_path):
    """load_train_state reconciles the ema field across format generations:
    pre-EMA files load into EMA-on and EMA-off templates, and EMA-on files
    load with EMA off (average dropped)."""

    import jax
    import numpy as np
    from flax import serialization

    from flow_timesnet_tpu.engine import TrainState
    from flow_timesnet_tpu.utils.artifacts import load_train_state, save_train_state

    params = {"w": np.arange(4, dtype=np.float32)}
    opt = {"m": np.zeros(4, np.float32)}
    state_off = TrainState(params=params, opt_state=opt, grad_accum=None, ema=None)

    # emulate a pre-EMA file: serialize, then strip the ema key entirely
    path = str(tmp_path / "ts.msgpack")
    save_train_state(path, state_off, {"epoch": 3})
    raw = serialization.msgpack_restore(open(path, "rb").read())
    del raw["state"]["ema"]
    open(path, "wb").write(serialization.msgpack_serialize(raw))

    # old file -> EMA-off template
    got, extra = load_train_state(path, state_off)
    assert got.ema is None and extra["epoch"] == 3
    np.testing.assert_array_equal(got.params["w"], params["w"])

    # old file -> EMA-on template: average restarts from the resumed params
    state_on = TrainState(
        params=jax.tree_util.tree_map(np.zeros_like, params),
        opt_state=opt,
        grad_accum=None,
        ema=jax.tree_util.tree_map(np.zeros_like, params),
    )
    got_on, _ = load_train_state(path, state_on)
    np.testing.assert_array_equal(got_on.ema["w"], params["w"])
    assert got_on.ema["w"] is not got_on.params["w"]  # distinct buffers

    # EMA-on file -> EMA-off template: the stored average is dropped
    ema_state = TrainState(
        params=params, opt_state=opt, grad_accum=None,
        ema={"w": np.full(4, 7.0, np.float32)},
    )
    path2 = str(tmp_path / "ts_ema.msgpack")
    save_train_state(path2, ema_state, {"epoch": 5})
    got_off, _ = load_train_state(path2, state_off)
    assert got_off.ema is None

    # EMA-on file -> EMA-on template: round-trips intact
    got_rt, _ = load_train_state(path2, state_on)
    np.testing.assert_array_equal(got_rt.ema["w"], np.full(4, 7.0, np.float32))


def test_train_state_round_trips_best_frozen_spec(tmp_path):
    """best_frozen_spec survives save_train_state/load_train_state so a
    resumed run records the right spec into config_used.yaml."""

    import jax

    from flow_timesnet_tpu.engine import Engine
    from flow_timesnet_tpu.models.timesnet import TimesNetConfig
    from flow_timesnet_tpu.utils import artifacts as artifacts_io

    cfg = TimesNetConfig(
        input_len=14, pred_len=4, d_model=8, d_ff=16, n_layers=1, k_periods=2,
        kernel_set=((3, 3),), dropout=0.0, activation="gelu", mode="direct",
        c_in=1, id_vocab=2,
    )
    engine = Engine(cfg, num_series=2)
    batch = {
        "x": np.zeros((2, 14, 1), np.float32),
        "y": np.zeros((2, 4, 1), np.float32),
        "mask": np.ones((2, 4, 1), np.float32),
        "x_mark": None, "y_mark": None, "static": None,
        "ids": np.arange(2).reshape(2, 1), "floor": None, "row_valid": None,
    }
    state = engine.init_state(jax.random.PRNGKey(0), batch)
    spec = (((7, 4, True), (10, 3, False)),)
    path = str(tmp_path / "train_state.msgpack")
    artifacts_io.save_train_state(
        path, state,
        {"epoch": 1,
         "best_frozen_spec": [[list(s) for s in layer] for layer in spec]},
    )
    _, extra = artifacts_io.load_train_state(path, state)
    restored = Engine.frozen_spec_from_config(
        extra.get("best_frozen_spec"), cfg.n_layers
    )
    assert restored == spec
    # dynamic-best runs store [] which must deserialize to None
    artifacts_io.save_train_state(path, state, {"best_frozen_spec": []})
    _, extra = artifacts_io.load_train_state(path, state)
    assert Engine.frozen_spec_from_config(extra.get("best_frozen_spec"), 1) is None
