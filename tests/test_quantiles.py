"""Predictive quantiles: the NB2 ppf utility and the predict-side rendering.

No reference analogue (the reference discards the dispersion head at
inference, ``/root/reference/src/timesnet_forecast/predict.py:345``); the
contracts tested here are the ones README documents for
``predict.quantiles``:

- the exact-NB path agrees with an independent pmf-accumulation oracle (and
  the scipy-free fallback IS that oracle, cross-checked against scipy);
- ``predict.quantiles`` renders one extra submission per level with the same
  writer/template contract as the mean, cell-wise monotone in the level;
- ensembles reduce quantile files member-wise (Vincentized mean / median).
"""

import math
import os

import numpy as np
import pandas as pd
import pytest

from flow_timesnet_tpu.config import PipelineConfig
from flow_timesnet_tpu.predict import predict_once
from flow_timesnet_tpu.train import train_once
from flow_timesnet_tpu.utils.quantiles import (
    _nb2_ppf_numpy,
    nb2_normal_ppf,
    nb2_ppf,
    normal_ppf,
    parse_quantile_config,
    quantile_label,
    quantile_out_path,
    resolve_method,
)


# ---------------------------------------------------------------------------
# unit: the quantile math
# ---------------------------------------------------------------------------


def _nb2_cdf_oracle(k, mu, alpha):
    """Scalar NB2 CDF by direct summation of the pmf (log-space lgamma)."""

    n = 1.0 / alpha
    p = n / (n + mu)
    total = 0.0
    for i in range(int(k) + 1):
        log_pmf = (
            math.lgamma(i + n)
            - math.lgamma(n)
            - math.lgamma(i + 1)
            + n * math.log(p)
            + i * math.log1p(-p)
        )
        total += math.exp(log_pmf)
    return total


@pytest.mark.parametrize("mu,alpha", [(0.5, 2.0), (3.0, 0.5), (20.0, 0.1), (120.0, 0.03)])
@pytest.mark.parametrize("q", [0.05, 0.1, 0.5, 0.9, 0.99])
def test_nb2_ppf_is_smallest_k_reaching_q(mu, alpha, q):
    k = float(nb2_ppf(q, np.asarray([mu]), np.asarray([alpha]))[0])
    assert k == int(k) and k >= 0
    assert _nb2_cdf_oracle(k, mu, alpha) >= q - 1e-12
    if k > 0:
        assert _nb2_cdf_oracle(k - 1, mu, alpha) < q


def test_numpy_fallback_matches_scipy():
    scipy_stats = pytest.importorskip("scipy.stats")
    rng = np.random.default_rng(0)
    mu = rng.uniform(0.05, 200.0, size=64)
    alpha = rng.uniform(0.01, 3.0, size=64)
    for q in (0.1, 0.5, 0.9, 0.975):
        ours = _nb2_ppf_numpy(q, mu, alpha)
        n = 1.0 / alpha
        ref = scipy_stats.nbinom.ppf(q, n, n / (n + mu))
        np.testing.assert_array_equal(ours, ref)


def test_nb2_ppf_respects_no_scipy_hook(monkeypatch):
    monkeypatch.setenv("FLOW_TIMESNET_NO_SCIPY", "1")
    mu, alpha = np.asarray([5.0]), np.asarray([0.3])
    got = nb2_ppf(0.9, mu, alpha)
    np.testing.assert_array_equal(got, _nb2_ppf_numpy(0.9, mu, alpha))


def test_normal_ppf_and_moment_matched_quantile():
    assert abs(normal_ppf(0.5)) < 1e-12
    assert abs(normal_ppf(0.975) - 1.959964) < 1e-5
    mu = np.asarray([4.0])
    alpha = np.asarray([0.25])
    sd = math.sqrt(4.0 + 0.25 * 16.0)
    got = nb2_normal_ppf(0.9, mu, alpha)[0]
    assert abs(got - (4.0 + normal_ppf(0.9) * sd)) < 1e-9
    # NOT clipped at zero: model space is centered for normalised pipelines,
    # so low quantiles must stay negative here (callers clip in final units
    # after the inverse transform)
    assert nb2_normal_ppf(0.001, np.asarray([0.1]), np.asarray([5.0]))[0] < 0.0


def test_quantile_levels_monotone():
    rng = np.random.default_rng(1)
    mu = rng.uniform(0.1, 50.0, size=32)
    alpha = rng.uniform(0.05, 2.0, size=32)
    prev = None
    for q in (0.05, 0.25, 0.5, 0.75, 0.95):
        cur = nb2_ppf(q, mu, alpha)
        if prev is not None:
            assert (cur >= prev).all()
        prev = cur


def test_config_parsing_and_paths():
    levels, method = parse_quantile_config(
        {"quantiles": [0.9, 0.1, 0.5, 0.5]}, "none"
    )
    assert levels == [0.1, 0.5, 0.9] and method == "nb"
    assert parse_quantile_config({"quantiles": []}, "none") == ([], "nb")
    assert parse_quantile_config({}, "zscore")[1] == "normal"
    assert resolve_method("nb", "zscore") == "nb"
    with pytest.raises(ValueError, match="in \\(0, 1\\)"):
        parse_quantile_config({"quantiles": [1.5]}, "none")
    with pytest.raises(ValueError, match="quantile method"):
        resolve_method("weird", "none")
    assert quantile_label(0.1) == "q10"
    assert quantile_label(0.975) == "q97.5"
    assert quantile_out_path("out/sub.csv", 0.9) == "out/sub.q90.csv"


# ---------------------------------------------------------------------------
# end-to-end: predict.quantiles renders extra submissions
# ---------------------------------------------------------------------------


def _write_dataset(tmp_path):
    rng = np.random.default_rng(0)
    T = 40
    dates = pd.date_range("2024-01-01", periods=T, freq="D")
    rows = []
    for j in range(3):
        vals = np.maximum(
            np.round(
                4 + 2 * np.sin(2 * math.pi * np.arange(T) / 7) + rng.normal(0, 0.3, T)
            ),
            0,
        )
        for d, v in zip(dates, vals):
            rows.append(
                {"date": d.strftime("%Y-%m-%d"), "id": f"S{j}", "target": float(v)}
            )
    train_csv = tmp_path / "train.csv"
    pd.DataFrame(rows).to_csv(train_csv, index=False)
    test_dir = tmp_path / "test"
    os.makedirs(test_dir)
    tdates = pd.date_range(dates[-1] + pd.Timedelta(days=1), periods=15, freq="D")
    trows = []
    for j in range(3):
        for d in tdates:
            trows.append(
                {"date": d.strftime("%Y-%m-%d"), "id": f"S{j}", "target": 3.0}
            )
    pd.DataFrame(trows).to_csv(test_dir / "TEST_00.csv", index=False)
    return train_csv, test_dir


def _base_cfg(train_csv, test_dir, art_dir, out_path, seed=1):
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
def trained(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("quantiles")
    train_csv, test_dir = _write_dataset(tmp_path)
    dirs = []
    for i, seed in enumerate((1, 2)):
        art = tmp_path / f"artifacts_{i}"
        cfg = _base_cfg(train_csv, test_dir, art, tmp_path / f"sub_{i}.csv", seed)
        train_once(PipelineConfig.from_mapping(cfg))
        dirs.append(str(art))
    return tmp_path, train_csv, test_dir, dirs


def test_predict_quantile_submissions(trained):
    tmp_path, train_csv, test_dir, dirs = trained
    out = tmp_path / "qsub.csv"
    cfg = _base_cfg(train_csv, test_dir, dirs[0], out)
    cfg["predict"] = {"quantiles": [0.1, 0.5, 0.9]}
    path = predict_once(PipelineConfig.from_mapping(cfg))
    mean_df = pd.read_csv(path, encoding="utf-8-sig")
    q_frames = {}
    for q in (0.1, 0.5, 0.9):
        q_path = quantile_out_path(str(out), q)
        assert os.path.exists(q_path), q_path
        q_frames[q] = pd.read_csv(q_path, encoding="utf-8-sig")
        # same writer contract: identical header and row keys as the mean
        assert list(q_frames[q].columns) == list(mean_df.columns)
        assert (q_frames[q].iloc[:, 0] == mean_df.iloc[:, 0]).all()
    v10 = q_frames[0.1].iloc[:, 1:].to_numpy(float)
    v50 = q_frames[0.5].iloc[:, 1:].to_numpy(float)
    v90 = q_frames[0.9].iloc[:, 1:].to_numpy(float)
    assert (v10 <= v50).all() and (v50 <= v90).all()
    assert (v90 > v10).any()  # intervals are non-degenerate somewhere
    # count-space pipeline -> exact NB quantiles are integers
    assert np.allclose(v50, np.round(v50))


def test_predict_quantiles_normal_method_under_zscore(trained):
    tmp_path, train_csv, test_dir, dirs = trained
    art = tmp_path / "artifacts_z"
    out = tmp_path / "zsub.csv"
    cfg = _base_cfg(train_csv, test_dir, art, out)
    cfg["preprocess"] = {"normalize": "zscore", "clip_negative": True}
    train_once(PipelineConfig.from_mapping(cfg))
    cfg["predict"] = {"quantiles": [0.25, 0.75]}  # auto -> normal under zscore
    predict_once(PipelineConfig.from_mapping(cfg))
    lo = pd.read_csv(quantile_out_path(str(out), 0.25), encoding="utf-8-sig")
    hi = pd.read_csv(quantile_out_path(str(out), 0.75), encoding="utf-8-sig")
    vlo, vhi = lo.iloc[:, 1:].to_numpy(float), hi.iloc[:, 1:].to_numpy(float)
    assert (vlo <= vhi).all() and (vhi > vlo).any()
    # continuous (moment-matched normal), not an integer grid
    assert not np.allclose(vhi, np.round(vhi))


def test_ensemble_reduces_quantile_files(trained):
    tmp_path, train_csv, test_dir, dirs = trained
    out = tmp_path / "ens_q.csv"
    cfg = _base_cfg(train_csv, test_dir, dirs[0], out)
    cfg["predict"] = {"ensemble_dirs": [dirs[1]], "quantiles": [0.9]}
    predict_once(PipelineConfig.from_mapping(cfg))
    ens = pd.read_csv(quantile_out_path(str(out), 0.9), encoding="utf-8-sig")
    members = [
        pd.read_csv(
            quantile_out_path(f"{out}.member{i}.csv", 0.9), encoding="utf-8-sig"
        )
        for i in range(2)
    ]
    stacked = np.stack([m.iloc[:, 1:].to_numpy(float) for m in members])
    np.testing.assert_allclose(
        ens.iloc[:, 1:].to_numpy(float), stacked.mean(axis=0), rtol=0, atol=1e-9
    )


def test_evaluate_reports_interval_calibration(trained):
    from flow_timesnet_tpu.evaluate import evaluate_once

    tmp_path, train_csv, test_dir, dirs = trained
    cfg = _base_cfg(train_csv, test_dir, dirs[0], tmp_path / "ev.csv")
    cfg["evaluation"] = {"quantiles": [0.1, 0.5, 0.9]}
    res = evaluate_once(PipelineConfig.from_mapping(cfg))
    q = res["quantiles"]
    assert set(q) == {"0.1", "0.5", "0.9"} and res["quantile_method"] == "nb"
    covs = [q[k]["coverage"] for k in ("0.1", "0.5", "0.9")]
    assert all(0.0 <= c <= 1.0 for c in covs)
    assert covs[0] <= covs[1] <= covs[2]
    assert covs[2] >= 0.5  # q90 must cover at least half the cells
    assert all(q[k]["pinball"] >= 0.0 for k in q)
    # falls back to predict.quantiles when evaluation.quantiles is absent
    cfg2 = _base_cfg(train_csv, test_dir, dirs[0], tmp_path / "ev2.csv")
    cfg2["predict"] = {"quantiles": [0.5]}
    res2 = evaluate_once(PipelineConfig.from_mapping(cfg2))
    assert set(res2["quantiles"]) == {"0.5"}
