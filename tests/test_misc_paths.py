"""Remaining path coverage: remat, short-history strategies, CLI, gaussian NLL."""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from torch_ref import HAS_REFERENCE

from flow_timesnet_tpu.cli import main as cli_main
from flow_timesnet_tpu.config import PipelineConfig, save_yaml
from flow_timesnet_tpu.engine import Engine
from flow_timesnet_tpu.losses import gaussian_nll_loss
from flow_timesnet_tpu.models.timesnet import TimesNetConfig
from flow_timesnet_tpu.predict import predict_once
from flow_timesnet_tpu.train import train_once


def test_activation_checkpoint_matches_plain():
    """use_checkpoint (jax.checkpoint/remat) must not change values or grads."""

    common = dict(
        input_len=16, pred_len=4, d_model=8, d_ff=16, n_layers=2, k_periods=2,
        kernel_set=((3, 3),), dropout=0.0, mode="direct", min_period_threshold=2,
        c_in=1, id_vocab=2, id_embed_dim=4,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 16, 1)).astype(np.float32) + 3)
    y = jnp.asarray(rng.poisson(3.0, (4, 4, 1)).astype(np.float32))
    batch = {
        "x": x, "y": y, "mask": jnp.ones_like(y), "x_mark": None, "y_mark": None,
        "static": None, "ids": jnp.zeros((4, 1), jnp.int32), "row_valid": jnp.ones(4),
    }
    e_plain = Engine(TimesNetConfig(**common, use_checkpoint=False), num_series=2)
    e_remat = Engine(TimesNetConfig(**common, use_checkpoint=True), num_series=2)
    s_plain = e_plain.init_state(jax.random.PRNGKey(0), batch)
    s_remat = e_remat.init_state(jax.random.PRNGKey(0), batch)
    for a, b in zip(
        jax.tree_util.tree_leaves(s_plain.params), jax.tree_util.tree_leaves(s_remat.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    s_plain, l1, _ = e_plain.train_step(s_plain, 1e-3, jax.random.PRNGKey(1), batch, True)
    s_remat, l2, _ = e_remat.train_step(s_remat, 1e-3, jax.random.PRNGKey(1), batch, True)
    assert float(l1) == pytest.approx(float(l2), rel=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(s_plain.params), jax.tree_util.tree_leaves(s_remat.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)

    # Period telemetry must survive remat: the engine routes it through a
    # non-remat twin with the identical param tree, so observability no longer
    # disappears exactly on the big configs that use checkpointing.
    t_plain = e_plain.collect_period_telemetry(s_plain.params, batch)
    t_remat = e_remat.collect_period_telemetry(s_remat.params, batch)
    assert set(t_remat) == set(t_plain) and len(t_remat) == 2
    for k in t_plain:
        np.testing.assert_array_equal(t_remat[k]["periods"], t_plain[k]["periods"])


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference checkout missing")
def test_gaussian_nll_matches_reference():
    import torch

    from timesnet_forecast.train import gaussian_nll_loss as ref_gnll

    rng = np.random.default_rng(0)
    mu = rng.standard_normal((2, 4, 3)).astype(np.float32)
    sigma = rng.gamma(2.0, 0.5, (2, 4, 3)).astype(np.float32)
    target = rng.standard_normal((2, 4, 3)).astype(np.float32)
    floor = np.abs(rng.standard_normal((1, 1, 3))).astype(np.float32)

    ours_scalar = np.asarray(gaussian_nll_loss(jnp.asarray(mu), jnp.asarray(sigma),
                                               jnp.asarray(target), 0.3))
    theirs_scalar = ref_gnll(torch.from_numpy(mu), torch.from_numpy(sigma),
                             torch.from_numpy(target), 0.3).numpy()
    np.testing.assert_allclose(ours_scalar, theirs_scalar, rtol=1e-5, atol=1e-6)

    ours_vec = np.asarray(gaussian_nll_loss(jnp.asarray(mu), jnp.asarray(sigma),
                                            jnp.asarray(target), jnp.asarray(floor)))
    theirs_vec = ref_gnll(torch.from_numpy(mu), torch.from_numpy(sigma),
                          torch.from_numpy(target), torch.from_numpy(floor)).numpy()
    np.testing.assert_allclose(ours_vec, theirs_vec, rtol=1e-5, atol=1e-6)


@pytest.fixture(scope="module")
def short_history_setup(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("short_hist")
    rng = np.random.default_rng(0)
    T = 50
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
    # test file with ONLY 6 days of history (< input_len 12)
    test_dir = tmp_path / "test"
    os.makedirs(test_dir)
    short_dates = pd.date_range(dates[-1] + pd.Timedelta(days=1), periods=6, freq="D")
    srows = []
    for j in range(2):
        for d in short_dates:
            srows.append({"date": d.strftime("%Y-%m-%d"), "id": f"S{j}", "target": 3.0})
    pd.DataFrame(srows).to_csv(test_dir / "TEST_00.csv", index=False)
    return tmp_path, train_csv, test_dir


def _short_cfg(tmp_path, train_csv, test_dir, strategy):
    return {
        "data": {
            "train_csv": str(train_csv), "test_dir": str(test_dir),
            "date_col": "date", "id_col": "id", "target_col": "target",
            "horizon": 3, "time_features": {"enabled": False},
        },
        "preprocess": {"normalize": "none", "clip_negative": True},
        "window": {"input_len": 12, "pred_len": 3, "short_series_strategy": strategy,
                   "pad_value": 1.5},
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
        "artifacts": {"dir": str(tmp_path / f"artifacts_{strategy}")},
        "submission": {"out_path": str(tmp_path / f"sub_{strategy}.csv"),
                       "format": "row_key"},
        "tuning": {"seed": 1},
    }


@pytest.mark.parametrize("strategy", ["repeat", "pad"])
def test_short_history_strategies(short_history_setup, strategy):
    tmp_path, train_csv, test_dir = short_history_setup
    cfg = _short_cfg(tmp_path, train_csv, test_dir, strategy)
    train_once(PipelineConfig.from_mapping(cfg))
    out = predict_once(PipelineConfig.from_mapping(cfg))
    sub = pd.read_csv(out)
    assert len(sub) == 3
    assert np.all(np.isfinite(sub.iloc[:, 1:].to_numpy(dtype=float)))


def test_short_history_error_strategy(short_history_setup):
    tmp_path, train_csv, test_dir = short_history_setup
    cfg = _short_cfg(tmp_path, train_csv, test_dir, "error")
    train_once(PipelineConfig.from_mapping(cfg))
    with pytest.raises(ValueError, match="shorter than required input_len"):
        predict_once(PipelineConfig.from_mapping(cfg))


def test_cli_train_and_predict(short_history_setup, tmp_path):
    base, train_csv, test_dir = short_history_setup
    cfg = _short_cfg(tmp_path, train_csv, test_dir, "repeat")
    cfg_path = tmp_path / "cfg.yaml"
    save_yaml(cfg, str(cfg_path))
    cli_main(["train", "--config", str(cfg_path), "--override", "train.epochs=1"])
    cli_main(["predict", "--config", str(cfg_path)])
    assert os.path.exists(cfg["submission"]["out_path"])


def test_zero_k_periods_model_is_identity_blocks():
    """k_periods=0: blocks pass through; heads still produce valid outputs."""

    cfg = TimesNetConfig(
        input_len=12, pred_len=3, d_model=8, d_ff=16, n_layers=2, k_periods=0,
        kernel_set=((3, 3),), dropout=0.0, mode="direct", c_in=1, id_vocab=2,
        id_embed_dim=2,
    )
    engine = Engine(cfg, num_series=2)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 12, 1)).astype(np.float32) + 3)
    batch = {
        "x": x, "y": jnp.ones((2, 3, 1)), "mask": jnp.ones((2, 3, 1)),
        "x_mark": None, "y_mark": None, "static": None,
        "ids": jnp.zeros((2, 1), jnp.int32), "row_valid": jnp.ones(2),
    }
    state = engine.init_state(jax.random.PRNGKey(0), batch)
    rate, disp = engine.forward(state.params, x, ids=batch["ids"])
    assert np.all(np.asarray(rate) > 0)
    # zero-init heads + identity blocks -> copy-last-step baseline exactly
    expected = np.log1p(np.exp(np.asarray(x)[:, -3:, :])) + 1e-6
    np.testing.assert_allclose(np.asarray(rate), expected, rtol=1e-5, atol=1e-6)
    state, loss, _ = engine.train_step(state, 1e-3, jax.random.PRNGKey(1), batch, True)
    assert np.isfinite(float(loss))


def test_dependency_bootstrap():
    from flow_timesnet_tpu.dependency import bootstrap

    key, devices = bootstrap(seed=1)
    assert len(devices) >= 1
    assert key is not None


def test_cli_override_repeatable_and_multivalued():
    """--override must accept repeated flags AND multiple pairs per flag
    (argparse nargs=* without append silently kept only the last flag)."""

    from flow_timesnet_tpu.cli import build_parser

    parser = build_parser()
    args = parser.parse_args(
        ["train", "--override", "a.b=1", "--override", "c.d=2", "e.f=3"]
    )
    flat = [o for group in args.override for o in group]
    assert flat == ["a.b=1", "c.d=2", "e.f=3"]


def test_host_pipeline_uses_prefetcher_and_trains(short_history_setup, monkeypatch):
    """input_pipeline=host must route batches through the Prefetcher thread."""

    from flow_timesnet_tpu import train as train_mod
    from flow_timesnet_tpu.data.windows import Prefetcher

    created = []

    class SpyPrefetcher(Prefetcher):
        def __init__(self, iterable, depth=2):
            created.append(depth)
            super().__init__(iterable, depth)

    monkeypatch.setattr(train_mod, "Prefetcher", SpyPrefetcher)
    tmp_path, train_csv, test_dir = short_history_setup
    cfg = _short_cfg(tmp_path, train_csv, test_dir, "repeat")
    cfg["train"]["input_pipeline"] = "host"
    cfg["train"]["epochs"] = 2
    pcfg = PipelineConfig.from_mapping(cfg)
    best_nll, _ = train_once(pcfg)
    assert np.isfinite(best_nll)
    assert created == [2, 2]  # one prefetcher per epoch, default depth 2

    # prefetch_factor=0 disables the thread entirely
    created.clear()
    cfg["train"]["prefetch_factor"] = 0
    cfg["artifacts"]["dir"] = str(tmp_path / "artifacts_nopf")
    best_nll2, _ = train_once(PipelineConfig.from_mapping(cfg))
    assert np.isfinite(best_nll2)
    assert created == []
    # same data, same seeds: the thread must not change the trajectory
    assert abs(best_nll - best_nll2) < 1e-9


def test_debug_knobs_train_end_to_end(short_history_setup, capsys):
    """``train.debug_nans`` + ``model.debug_memory`` (SURVEY §5.1-5.2).

    The sanitizer flag must be enabled for the run and the memory report must
    not break on backends without memory introspection (CPU returns None).
    """

    tmp_path, train_csv, test_dir = short_history_setup
    cfg = _short_cfg(tmp_path, train_csv, test_dir, "repeat")
    cfg["train"]["debug_nans"] = True
    cfg["model"]["debug_memory"] = True
    cfg["artifacts"]["dir"] = str(tmp_path / "artifacts_debug")
    assert not jax.config.jax_debug_nans
    best_nll, _ = train_once(PipelineConfig.from_mapping(cfg))
    assert np.isfinite(best_nll)
    # the flag is process-global: train_once must restore it on exit so a
    # debug run cannot leak de-optimized NaN checking into later work
    assert not jax.config.jax_debug_nans
    # under the flag a NaN-producing jitted program raises at the source
    try:
        jax.config.update("jax_debug_nans", True)
        with pytest.raises(FloatingPointError):
            jax.jit(lambda x: jnp.log(x) * 0.0 + jnp.sqrt(x))(jnp.float32(-1.0))
    finally:
        jax.config.update("jax_debug_nans", False)


def test_ema_train_end_to_end_and_resume(short_history_setup, tmp_path):
    """``train.ema_decay`` end to end: the checkpointed weights are the
    averaged ones, the train-state round-trips the EMA buffers on resume,
    and gradient accumulation keeps the average consistent."""

    from flow_timesnet_tpu.utils.artifacts import load_checkpoint

    tmp, train_csv, test_dir = short_history_setup
    cfg = _short_cfg(tmp, train_csv, test_dir, "repeat")
    cfg["train"]["ema_decay"] = 0.98
    cfg["train"]["epochs"] = 2
    cfg["train"]["save_train_state"] = True
    cfg["artifacts"]["dir"] = str(tmp_path / "art_ema")
    best_nll, _ = train_once(PipelineConfig.from_mapping(cfg))
    assert np.isfinite(best_nll)

    # the checkpoint carries finite averaged weights and the state file exists
    params, _ = load_checkpoint(str(tmp_path / "art_ema" / "timesnet.msgpack"))
    assert all(
        np.all(np.isfinite(np.asarray(p))) for p in jax.tree_util.tree_leaves(params)
    )
    st_path = str(tmp_path / "art_ema" / "train_state.msgpack")
    assert os.path.exists(st_path)

    # resume one more epoch: the template must accept the ema field
    cfg["train"]["epochs"] = 3
    cfg["train"]["resume"] = True
    best_nll2, _ = train_once(PipelineConfig.from_mapping(cfg))
    assert np.isfinite(best_nll2)

    # accumulation path keeps EMA enabled (host pipeline is forced)
    cfg2 = _short_cfg(tmp, train_csv, test_dir, "repeat")
    cfg2["train"]["ema_decay"] = 0.9
    cfg2["train"]["accumulation_steps"] = 2
    cfg2["artifacts"]["dir"] = str(tmp_path / "art_ema_accum")
    best_nll3, _ = train_once(PipelineConfig.from_mapping(cfg2))
    assert np.isfinite(best_nll3)


def test_all_masked_eval_batch_contributes_nothing():
    """A batch whose loss mask is entirely zero must add (0, 0) to the
    streamed eval accumulators — not a fabricated full-size denominator that
    deflates the aggregate NLL."""

    cfg = TimesNetConfig(
        input_len=16, pred_len=4, d_model=8, d_ff=16, n_layers=1, k_periods=1,
        kernel_set=((3, 3),), dropout=0.0, mode="direct", min_period_threshold=2,
        c_in=1, id_vocab=2, id_embed_dim=4,
    )
    engine = Engine(cfg, num_series=2, use_loss_masking=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 16, 1)).astype(np.float32) + 3)
    y = jnp.asarray(rng.poisson(3.0, (4, 4, 1)).astype(np.float32))
    ids = jnp.zeros((4, 1), jnp.int32)
    good = {"x": x, "y": y, "mask": jnp.ones_like(y), "x_mark": None,
            "y_mark": None, "static": None, "ids": ids, "row_valid": jnp.ones(4)}
    dead = dict(good, mask=jnp.zeros_like(y))
    state = engine.init_state(jax.random.PRNGKey(0), good)
    m_good = engine.evaluate(state.params, [good])
    m_both = engine.evaluate(state.params, [good, dead])
    assert float(m_both["nll"]) == pytest.approx(float(m_good["nll"]), rel=1e-6)
    assert float(m_both["smape"]) == pytest.approx(float(m_good["smape"]), rel=1e-6)


def test_rolling_cv_scaler_fits_on_last_fold_train(tmp_path, monkeypatch):
    """The rolling-CV scaler must be fit on the LAST fold's train slice —
    the only slice that precedes every fold's validation window. (The
    reference fits on the first/longest fold's train, leaking later folds'
    validation rows into the normalization statistics.)"""

    import flow_timesnet_tpu.train as train_mod
    from flow_timesnet_tpu.data.pivot import fit_series_scaler as real_fit

    rng = np.random.default_rng(0)
    T = 60
    dates = pd.date_range("2024-01-01", periods=T, freq="D")
    rows = []
    for j in range(2):
        vals = np.maximum(np.round(4 + rng.normal(0, 0.5, T)), 0)
        for d, v in zip(dates, vals):
            rows.append({"date": d.strftime("%Y-%m-%d"), "id": f"S{j}", "target": float(v)})
    train_csv = tmp_path / "train.csv"
    pd.DataFrame(rows).to_csv(train_csv, index=False)

    seen_lengths = []

    def spy_fit(df, *args, **kwargs):
        seen_lengths.append(len(df))
        return real_fit(df, *args, **kwargs)

    monkeypatch.setattr(train_mod, "fit_series_scaler", spy_fit)
    cfg = {
        "data": {"train_csv": str(train_csv), "date_col": "date", "id_col": "id",
                 "target_col": "target", "time_features": {"enabled": False}},
        "preprocess": {"normalize": "zscore", "normalize_per_series": True,
                       "clip_negative": True},
        "window": {"input_len": 10, "pred_len": 2},
        "model": {"mode": "direct", "input_len": 10, "pred_len": 2, "d_model": 8,
                  "d_ff": 16, "n_layers": 1, "k_periods": 1,
                  "min_period_threshold": 2, "kernel_set": [[3, 3]],
                  "dropout": 0.0, "id_embed_dim": 2},
        "train": {"device": "cpu", "epochs": 1, "batch_size": 8, "lr": 1e-3,
                  "lr_warmup_steps": 0,
                  "val": {"strategy": "rolling", "rolling_folds": 2,
                          "rolling_step_days": 7, "holdout_days": 14}},
        "artifacts": {"dir": str(tmp_path / "artifacts")},
        "tuning": {"seed": 1},
    }
    train_once(PipelineConfig.from_mapping(cfg))
    # fold 0: val [46, 60), train len 46; fold 1: val [39, 53), train len 39.
    # The scaler must see the 39-row slice, not the leaky 46-row one.
    assert seen_lengths == [39]
