"""Trace-time period specialization (``train.freeze_periods``, VERDICT r3 #1).

1. Forward/grad parity: freezing the telemetry-observed selection into
   static constants must reproduce the dynamic masked-tap path exactly
   (the dense reshape conv IS the same Conv2d; only the fp reassociation
   of the weight softmax can differ).
2. Trajectory parity at the trainer level: ``train_once`` with freezing on
   must land at the same best val NLL as the dynamic run when selections
   are stable across epochs (the flagship regime).
3. The frozen spec snapshot helper round-trips telemetry.
"""

import dataclasses
import os
import subprocess
import sys

import jax
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tiny_cfg(**overrides):
    from flow_timesnet_tpu.models.timesnet import TimesNetConfig

    base = dict(
        input_len=28, pred_len=7, d_model=16, d_ff=32, n_layers=2,
        k_periods=2, kernel_set=((3, 3), (5, 5)), dropout=0.0,
        min_period_threshold=2, c_in=1, static_dim=3, time_features=4,
        id_vocab=8, id_embed_dim=4, static_proj_dim=4, bottleneck_ratio=2.0,
    )
    base.update(overrides)
    return TimesNetConfig(**base)


def _batch(cfg, B=16, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(cfg.input_len, dtype=np.float32)
    x = (
        2.0
        + np.sin(2 * np.pi * t / 7.0)[None, :, None]
        + 0.3 * rng.standard_normal((B, cfg.input_len, 1))
    ).astype(np.float32)
    marks = rng.standard_normal((B, cfg.input_len, cfg.time_features)).astype(np.float32)
    static = rng.standard_normal((B, 1, cfg.static_dim)).astype(np.float32)
    ids = rng.integers(0, cfg.id_vocab, (B, 1)).astype(np.int32)
    return x, marks, static, ids


def _spec_from_forward(model, params, x, marks, static, ids, n_layers):
    _, aux = model.apply(
        {"params": params}, x, marks, static, ids,
        deterministic=True, mutable=["intermediates"],
    )
    inter = aux["intermediates"]
    spec = []
    for i in range(n_layers):
        blk = inter[f"blocks_{i}"]
        p = np.asarray(blk["selected_periods"][0])
        v = np.asarray(blk["period_valid"][0])
        f = np.asarray(blk["freq_indices"][0])
        spec.append(tuple((int(pp), int(ff), bool(vv)) for pp, ff, vv in zip(p, f, v)))
    return tuple(spec)


@pytest.mark.parametrize("use_checkpoint", [False, True])
def test_frozen_forward_matches_dynamic(use_checkpoint):
    from flow_timesnet_tpu.models.timesnet import TimesNet

    cfg = _tiny_cfg(use_checkpoint=use_checkpoint)
    x, marks, static, ids = _batch(cfg)
    model = TimesNet(cfg)
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, x, marks, static, ids, deterministic=True
    )["params"]
    rate_d, disp_d = model.apply(
        {"params": params}, x, marks, static, ids, deterministic=True
    )
    spec = _spec_from_forward(model, params, x, marks, static, ids, cfg.n_layers)
    assert any(v for layer in spec for _, _, v in layer)

    fmodel = TimesNet(dataclasses.replace(cfg, frozen_periods=spec))
    rate_f, disp_f = fmodel.apply(
        {"params": params}, x, marks, static, ids, deterministic=True
    )
    np.testing.assert_allclose(np.asarray(rate_f), np.asarray(rate_d), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(disp_f), np.asarray(disp_d), rtol=1e-5, atol=1e-6)

    def loss(m):
        def f(p_):
            r, d = m.apply({"params": p_}, x, marks, static, ids, deterministic=True)
            return (r.astype(np.float32) ** 2).mean() + (d.astype(np.float32) ** 2).mean()

        return f

    g_d = jax.grad(loss(model))(params)
    g_f = jax.grad(loss(fmodel))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_d), jax.tree_util.tree_leaves(g_f)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_frozen_spec_helper_and_param_tree_identity():
    from flow_timesnet_tpu.engine import Engine
    from flow_timesnet_tpu.models.timesnet import TimesNet

    cfg = _tiny_cfg()
    x, marks, static, ids = _batch(cfg)
    model = TimesNet(cfg)
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, x, marks, static, ids, deterministic=True
    )["params"]
    spec = _spec_from_forward(model, params, x, marks, static, ids, cfg.n_layers)

    telemetry = {
        f"blocks_{i}": {
            "periods": np.asarray([p for p, _, _ in layer]),
            "valid": np.asarray([v for _, _, v in layer]),
            "freq_indices": np.asarray([f for _, f, _ in layer]),
            "group_count": 1,
        }
        for i, layer in enumerate(spec)
    }
    # the helper canonicalizes slot order (valid first, then sorted) so the
    # drift comparison ignores top-k rank swaps — compare as multisets
    got = Engine.frozen_spec_from_telemetry(telemetry, cfg.n_layers)
    assert tuple(tuple(sorted(l)) for l in got) == tuple(
        tuple(sorted(l)) for l in spec
    )
    assert Engine.frozen_spec_from_telemetry({}, cfg.n_layers) is None

    # the frozen model must create the IDENTICAL parameter tree (so the
    # trainer can swap engines mid-run without touching state)
    fmodel = TimesNet(dataclasses.replace(cfg, frozen_periods=spec))
    fparams = fmodel.init(
        {"params": jax.random.PRNGKey(0)}, x, marks, static, ids, deterministic=True
    )["params"]
    d = jax.tree_util.tree_structure(params)
    f = jax.tree_util.tree_structure(fparams)
    assert d == f
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(fparams)):
        assert a.shape == b.shape and a.dtype == b.dtype


def test_frozen_forward_all_invalid_is_identity():
    from flax import linen as nn  # noqa: F401 (import guard)

    from flow_timesnet_tpu.models.timesnet import TimesNet

    cfg = _tiny_cfg()
    x, marks, static, ids = _batch(cfg)
    model = TimesNet(cfg)
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, x, marks, static, ids, deterministic=True
    )["params"]
    dead = tuple(
        tuple((7, 4, False) for _ in range(cfg.k_periods)) for _ in range(cfg.n_layers)
    )
    fmodel = TimesNet(dataclasses.replace(cfg, frozen_periods=dead))
    rate, disp = fmodel.apply(
        {"params": params}, x, marks, static, ids, deterministic=True
    )
    assert np.all(np.isfinite(np.asarray(rate)))
    assert np.all(np.isfinite(np.asarray(disp)))


def _write_clean_weekly_csv(path, T=90, n_series=4, seed=0):
    """Strong clean weekly seasonality -> the FFT selection is stable across
    epochs, so freezing deterministically engages and never drifts."""

    import pandas as pd

    rng = np.random.default_rng(seed)
    dates = pd.date_range("2024-01-01", periods=T, freq="D")
    rows = []
    for j in range(n_series):
        base = 5 + j + 2.0 * np.sin(2 * np.pi * np.arange(T) / 7.0)
        vals = np.maximum(np.round(base + rng.normal(0, 0.3, T)), 0)
        for d, v in zip(dates, vals):
            rows.append(
                {"date": d.strftime("%Y-%m-%d"), "id": f"S{j}", "target": float(v)}
            )
    pd.DataFrame(rows).to_csv(path, index=False)


def _train_cfg(train_csv, tmp_path, tag, extra):
    return {
        "data": {"train_csv": str(train_csv), "date_col": "date", "id_col": "id",
                 "target_col": "target", "time_features": {"enabled": False}},
        "preprocess": {"normalize": "none", "clip_negative": True},
        "window": {"input_len": 28, "pred_len": 7},
        "model": {"mode": "direct", "input_len": 28, "pred_len": 7, "d_model": 8,
                  "d_ff": 16, "n_layers": 2, "k_periods": 2,
                  "min_period_threshold": 2, "kernel_set": [[3, 3]],
                  "dropout": 0.0, "id_embed_dim": 2},
        "train": {"device": "cpu", "epochs": 4, "batch_size": 32, "lr": 1e-3,
                  "lr_warmup_steps": 0,
                  "val": {"strategy": "holdout", "holdout_days": 40},
                  **extra},
        "artifacts": {"dir": str(tmp_path / tag)},
        "tuning": {"seed": 1},
    }


def test_train_once_freeze_trajectory_parity(tmp_path):
    import yaml

    from flow_timesnet_tpu.config import PipelineConfig
    from flow_timesnet_tpu.train import train_once

    train_csv = tmp_path / "train.csv"
    _write_clean_weekly_csv(train_csv)

    nll_dyn, _ = train_once(
        PipelineConfig.from_mapping(_train_cfg(train_csv, tmp_path, "dyn", {}))
    )
    nll_frz, _ = train_once(
        PipelineConfig.from_mapping(
            _train_cfg(
                train_csv, tmp_path, "frz",
                {"freeze_periods": True, "freeze_after_epoch": 1},
            )
        )
    )
    # dropout 0 + stable selections: identical math modulo fp reassociation
    assert nll_frz == pytest.approx(nll_dyn, abs=2e-3)
    with open(os.path.join(tmp_path, "frz", "config_used.yaml"),
              encoding="utf-8") as f:
        used = yaml.safe_load(f)
    spec = used["train"].get("frozen_periods_spec")
    if spec is None:
        # acceptable only if the guard detected drift and recorded it
        assert used["train"].get("freeze_periods_drift_epoch"), (
            "freeze_periods neither engaged nor recorded a drift fallback"
        )
    else:
        assert len(spec) == used["model"]["n_layers"]


def test_frozen_spec_from_config_roundtrip():
    from flow_timesnet_tpu.engine import Engine

    spec = (
        ((7, 4, True), (27, 1, False)),
        ((7, 4, True), (14, 2, True)),
    )
    raw = [[list(s) for s in layer] for layer in spec]
    assert Engine.frozen_spec_from_config(raw, 2) == spec
    assert Engine.frozen_spec_from_config(None, 2) is None
    assert Engine.frozen_spec_from_config([], 2) is None
    with pytest.raises(ValueError):
        Engine.frozen_spec_from_config(raw, 3)  # layer-count mismatch
    with pytest.raises(ValueError):
        Engine.frozen_spec_from_config([[["x", 1, True]]], 1)  # malformed


def test_predict_freeze_periods_e2e(tmp_path):
    """predict.freeze_periods consumes the spec stored at the best epoch:
    frozen inference matches the dynamic path on stable clean-weekly data,
    and ``on`` fails loudly when the checkpoint never froze."""

    import pandas as pd
    import yaml

    from flow_timesnet_tpu.config import PipelineConfig
    from flow_timesnet_tpu.predict import predict_once
    from flow_timesnet_tpu.train import train_once

    train_csv = tmp_path / "train.csv"
    # lower noise + longer history than _write_clean_weekly_csv: the FFT
    # selection must stay stable through the LAST epoch so the best snapshot
    # is a frozen one (the recorded spec is the best epoch's, not the last's)
    rng = np.random.default_rng(3)
    T = 150
    tdates = pd.date_range("2024-01-01", periods=T, freq="D")
    rows = []
    for j in range(4):
        base = 6 + j + 3.0 * np.sin(2 * np.pi * np.arange(T) / 7.0)
        vals = np.maximum(np.round(base + rng.normal(0, 0.1, T)), 0)
        for d, v in zip(tdates, vals):
            rows.append({"date": d.strftime("%Y-%m-%d"), "id": f"S{j}",
                         "target": float(v)})
    pd.DataFrame(rows).to_csv(train_csv, index=False)

    test_dir = tmp_path / "test"
    os.makedirs(test_dir, exist_ok=True)
    dates = pd.date_range(tdates[-1] + pd.Timedelta(days=1), periods=35, freq="D")
    rows = []
    for j in range(4):
        base = 5 + j + 2.0 * np.sin(2 * np.pi * np.arange(len(dates)) / 7.0)
        for d, v in zip(dates, np.maximum(np.round(base), 0)):
            rows.append({"date": d.strftime("%Y-%m-%d"), "id": f"S{j}",
                         "target": float(v)})
    pd.DataFrame(rows).to_csv(test_dir / "TEST_00.csv", index=False)
    sample = pd.DataFrame({"row_key": [f"TEST_00+D{d}" for d in range(1, 8)]})
    for j in range(4):
        sample[f"S{j}"] = 0.0
    sample_path = tmp_path / "sample_submission.csv"
    sample.to_csv(sample_path, index=False)

    cfg = _train_cfg(
        train_csv, tmp_path, "frz_pred",
        {"freeze_periods": True, "freeze_after_epoch": 1, "epochs": 5},
    )
    cfg["data"].update(
        {"test_dir": str(test_dir), "sample_submission": str(sample_path)}
    )
    cfg["submission"] = {"format": "row_key",
                         "out_path": str(tmp_path / "sub_dyn.csv")}
    train_once(PipelineConfig.from_mapping(cfg))

    art_dir = tmp_path / "frz_pred"
    with open(art_dir / "config_used.yaml", encoding="utf-8") as f:
        used = yaml.safe_load(f)
    if used["train"].get("frozen_periods_spec") is None:
        pytest.skip("selection drifted on this seed; freeze never engaged")

    pred_cfg = dict(cfg)
    p_dyn = predict_once(PipelineConfig.from_mapping(pred_cfg))
    pred_cfg["submission"] = {"format": "row_key",
                              "out_path": str(tmp_path / "sub_frz.csv")}
    pred_cfg["predict"] = {"freeze_periods": "on"}
    p_frz = predict_once(PipelineConfig.from_mapping(pred_cfg))

    a = pd.read_csv(p_dyn).set_index("row_key")
    b = pd.read_csv(p_frz).set_index("row_key")
    # clean weekly data -> the TEST-window selection agrees with the stored
    # spec, so frozen inference is the same math (dense vs masked fold)
    np.testing.assert_allclose(b.to_numpy(), a.to_numpy(), rtol=1e-4, atol=1e-3)

    # frozen inference pins the selection, so chunking cannot change it:
    # 2-row chunks must reproduce the unchunked frozen submission exactly
    pred_cfg["predict"] = {"freeze_periods": "on", "chunk_rows": 2}
    pred_cfg["submission"] = {"format": "row_key",
                              "out_path": str(tmp_path / "sub_frz_chunked.csv")}
    p_chunk = predict_once(PipelineConfig.from_mapping(pred_cfg))
    d = pd.read_csv(p_chunk).set_index("row_key")
    np.testing.assert_allclose(d.to_numpy(), b.to_numpy(), rtol=1e-5, atol=1e-5)

    # chunk-aware DEFAULT (VERDICT r4 #6): chunking active + config silent on
    # freeze_periods -> defaults to auto -> the stored spec engages, so the
    # output equals the frozen submission (selection-invariant chunking),
    # not the chunk-local dynamic one
    pred_cfg["predict"] = {"chunk_rows": 2}
    pred_cfg["submission"] = {"format": "row_key",
                              "out_path": str(tmp_path / "sub_default_chunked.csv")}
    p_def = predict_once(PipelineConfig.from_mapping(pred_cfg))
    e = pd.read_csv(p_def).set_index("row_key")
    np.testing.assert_allclose(e.to_numpy(), b.to_numpy(), rtol=1e-5, atol=1e-5)
    pred_cfg["predict"] = {"freeze_periods": "on"}

    # strip the stored spec -> freeze_periods=on must fail loudly
    used["train"].pop("frozen_periods_spec", None)
    with open(art_dir / "config_used.yaml", "w", encoding="utf-8") as f:
        yaml.safe_dump(used, f)
    with pytest.raises(ValueError, match="frozen_periods_spec"):
        predict_once(PipelineConfig.from_mapping(pred_cfg))
    # ...but auto degrades gracefully to the dynamic path
    pred_cfg["predict"] = {"freeze_periods": "auto"}
    pred_cfg["submission"] = {"format": "row_key",
                              "out_path": str(tmp_path / "sub_auto.csv")}
    p_auto = predict_once(PipelineConfig.from_mapping(pred_cfg))
    c = pd.read_csv(p_auto).set_index("row_key")
    np.testing.assert_allclose(c.to_numpy(), a.to_numpy(), rtol=1e-6, atol=1e-6)
