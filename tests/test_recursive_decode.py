"""Recursive lax.scan decoder vs an explicit python rollout.

The scan decode must equal step-by-step feeding of predictions back into the
window (reference ``forecast_recursive_batch``, predict.py:307-342), and the
direct/recursive modes must share one checkpoint (same param tree).
"""

import jax
import jax.numpy as jnp
import numpy as np

from flow_timesnet_tpu.engine import Engine
from flow_timesnet_tpu.models.timesnet import TimesNetConfig


def _make(mode):
    cfg = TimesNetConfig(
        input_len=12,
        pred_len=4,
        d_model=8,
        d_ff=16,
        n_layers=1,
        k_periods=2,
        kernel_set=((3, 3),),
        dropout=0.0,
        mode=mode,
        min_period_threshold=2,
        c_in=1,
        static_dim=0,
        time_features=3,
        id_vocab=2,
        id_embed_dim=4,
    )
    return cfg, Engine(cfg, num_series=2)


def test_scan_rollout_matches_python_loop():
    cfg, engine = _make("recursive")
    rng = np.random.default_rng(0)
    B, H = 3, 4
    x = rng.standard_normal((B, cfg.input_len, 1)).astype(np.float32)
    x_mark = rng.standard_normal((B, cfg.input_len, 3)).astype(np.float32)
    y_mark = rng.standard_normal((B, H, 3)).astype(np.float32)
    ids = rng.integers(0, 2, (B, 1)).astype(np.int32)
    batch = {
        "x": jnp.asarray(x), "y": jnp.zeros((B, 1, 1)), "mask": jnp.ones((B, 1, 1)),
        "x_mark": jnp.asarray(x_mark), "y_mark": None, "static": None,
        "ids": jnp.asarray(ids), "row_valid": jnp.ones(B),
    }
    state = engine.init_state(jax.random.PRNGKey(0), batch)

    rates, disps = engine.rollout(
        state.params, jnp.asarray(x), H,
        x_mark=jnp.asarray(x_mark), y_mark=jnp.asarray(y_mark),
        ids=jnp.asarray(ids),
    )

    # python reference loop
    seq = jnp.asarray(x)
    marks = jnp.asarray(x_mark)
    exp_r, exp_d = [], []
    for step in range(H):
        r, d = engine.forward(state.params, seq, x_mark=marks, ids=jnp.asarray(ids))
        exp_r.append(np.asarray(r)[:, 0])
        exp_d.append(np.asarray(d)[:, 0])
        seq = jnp.concatenate([seq[:, 1:, :], r[:, -1:, :]], axis=1)
        marks = jnp.concatenate([marks[:, 1:, :], jnp.asarray(y_mark)[:, step : step + 1]], axis=1)
    np.testing.assert_allclose(np.asarray(rates), np.stack(exp_r, 1), rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(disps), np.stack(exp_d, 1), rtol=2e-5, atol=2e-6)


def test_direct_and_recursive_share_checkpoint_structure():
    """One param tree serves both decoders (out_steps differences are limited
    to the zero-initialised late-bias head width)."""

    cfg_d, eng_d = _make("direct")
    cfg_r, eng_r = _make("recursive")
    batch = {
        "x": jnp.zeros((2, cfg_d.input_len, 1)),
        "y": jnp.zeros((2, 1, 1)),
        "mask": jnp.ones((2, 1, 1)),
        "x_mark": jnp.zeros((2, cfg_d.input_len, 3)),
        "y_mark": None,
        "static": None,
        "ids": jnp.zeros((2, 1), jnp.int32),
        "row_valid": jnp.ones(2),
    }
    sd = eng_d.init_state(jax.random.PRNGKey(0), batch)
    sr = eng_r.init_state(jax.random.PRNGKey(0), batch)
    paths_d = set(jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_flatten_with_path(sd.params)[0])
    paths_r = set(jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_flatten_with_path(sr.params)[0])
    assert paths_d == paths_r
    # only late-bias head/gate widths differ (pred_len vs 1)
    for (pd, leaf_d), (pr, leaf_r) in zip(
        sorted(jax.tree_util.tree_flatten_with_path(sd.params)[0], key=lambda t: jax.tree_util.keystr(t[0])),
        sorted(jax.tree_util.tree_flatten_with_path(sr.params)[0], key=lambda t: jax.tree_util.keystr(t[0])),
    ):
        name = jax.tree_util.keystr(pd)
        if "late_bias" in name:
            continue
        assert leaf_d.shape == leaf_r.shape, name


def test_rollout_requires_future_marks():
    cfg, engine = _make("recursive")
    x = jnp.zeros((2, cfg.input_len, 1))
    marks = jnp.zeros((2, cfg.input_len, 3))
    with np.testing.assert_raises(ValueError):
        engine.rollout(None, x, 4, x_mark=marks, y_mark=None)


def test_rollout_row_valid_padding_invariance():
    """Recursive decode with zero-padded rows + row_valid must reproduce the
    unpadded rollout for the real rows (predict DP's recursive path)."""

    cfg, engine = _make("recursive")
    rng = np.random.default_rng(1)
    B, H, pad = 3, 4, 5
    x = rng.normal(2.0, 1.0, (B, cfg.input_len, 1)).astype(np.float32)
    x_mark = rng.normal(size=(B, cfg.input_len, 3)).astype(np.float32)
    y_mark = rng.normal(size=(B, H, 3)).astype(np.float32)
    ids = np.array([[0], [1], [0]], np.int32)

    params = engine.init_state(
        jax.random.PRNGKey(0),
        {"x": jnp.asarray(x), "x_mark": jnp.asarray(x_mark), "ids": jnp.asarray(ids)},
    ).params

    rate_ref, disp_ref = engine.rollout(
        params, jnp.asarray(x), H,
        x_mark=jnp.asarray(x_mark), y_mark=jnp.asarray(y_mark),
        ids=jnp.asarray(ids),
    )

    def pad0(a):
        widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return np.pad(a, widths)

    rv = np.concatenate([np.ones(B, np.float32), np.zeros(pad, np.float32)])
    rate_pad, disp_pad = engine.rollout(
        params, jnp.asarray(pad0(x)), H,
        x_mark=jnp.asarray(pad0(x_mark)), y_mark=jnp.asarray(pad0(y_mark)),
        ids=jnp.asarray(pad0(ids)), row_valid=jnp.asarray(rv),
    )

    np.testing.assert_allclose(
        np.asarray(rate_ref), np.asarray(rate_pad)[:B], rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(disp_ref), np.asarray(disp_pad)[:B], rtol=1e-5, atol=1e-6
    )
