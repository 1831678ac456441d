"""Long-context (L >= 512) and high-cardinality (N ~ 10k) configurations.

BASELINE configs #4 and #5: the static-shape period machinery must stay
jittable and numerically sane at long sequence lengths with period grouping
caps, and the embedding/context stack must scale to ~10k series with LRTC
rank 16 in bf16.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flow_timesnet_tpu.engine import Engine
from flow_timesnet_tpu.models.period import select_periods
from flow_timesnet_tpu.models.timesnet import TimesNet, TimesNetConfig


def test_long_context_forward_and_grad():
    L, H = 512, 24
    cfg = TimesNetConfig(
        input_len=L,
        pred_len=H,
        d_model=16,
        d_ff=32,
        n_layers=1,
        k_periods=4,
        kernel_set=((3, 3),),
        dropout=0.0,
        mode="direct",
        min_period_threshold=4,
        bottleneck_ratio=2.0,
        c_in=1,
        id_vocab=4,
        id_embed_dim=4,
        period_max_unique=2,
        period_binning=2.0,
    )
    engine = Engine(cfg, num_series=4)
    rng = np.random.default_rng(0)
    B = 2
    t = np.arange(L)
    x = (
        5
        + np.sin(2 * np.pi * t / 24.0)
        + 0.5 * np.sin(2 * np.pi * t / 168.0)
    )[None, :, None].repeat(B, 0).astype(np.float32)
    x += 0.1 * rng.standard_normal(x.shape).astype(np.float32)
    y = np.abs(rng.poisson(5.0, (B, H, 1))).astype(np.float32)
    batch = {
        "x": jnp.asarray(x), "y": jnp.asarray(y), "mask": jnp.ones_like(jnp.asarray(y)),
        "x_mark": None, "y_mark": None, "static": None,
        "ids": jnp.zeros((B, 1), jnp.int32), "row_valid": jnp.ones(B),
    }
    state = engine.init_state(jax.random.PRNGKey(0), batch)
    state, loss, _ = engine.train_step(state, 1e-3, jax.random.PRNGKey(1), batch, True)
    assert np.isfinite(float(loss))
    rate, disp = engine.forward(state.params, batch["x"], ids=batch["ids"])
    assert rate.shape == (B, H, 1)
    assert np.all(np.isfinite(np.asarray(rate)))

    # the selector must find the planted daily cycle (period ~24) among top-k
    sel = select_periods(jnp.asarray(x), 4, L, 4)
    valid_periods = np.asarray(sel.periods)[np.asarray(sel.valid)]
    assert any(abs(int(p) - 24) <= 2 for p in valid_periods), valid_periods


def test_high_cardinality_embedding_and_context():
    N = 10_000
    cfg = TimesNetConfig(
        input_len=28,
        pred_len=7,
        d_model=16,
        d_ff=32,
        n_layers=1,
        k_periods=2,
        kernel_set=((3, 3),),
        dropout=0.0,
        mode="direct",
        min_period_threshold=2,
        c_in=1,
        static_dim=5,
        id_vocab=N,
        id_embed_dim=16,
        static_proj_dim=8,
        use_zero_mean_context=True,
        context_rank=16,
        context_scale=0.05,
        compute_dtype="bfloat16",
    )
    model = TimesNet(cfg)
    rng = np.random.default_rng(0)
    B = 8
    x = rng.standard_normal((B, 28, 1)).astype(np.float32)
    static = rng.standard_normal((B, 1, 5)).astype(np.float32)
    ids = rng.integers(0, N, (B, 1)).astype(np.int32)
    ids[0, 0] = N - 1
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, None,
                           jnp.asarray(static), jnp.asarray(ids))
    assert variables["params"]["series_embedding"]["embedding"].shape == (N, 16)
    rate, disp = jax.jit(
        lambda v, *a: model.apply(v, *a, deterministic=True)
    )(variables, jnp.asarray(x), None, jnp.asarray(static), jnp.asarray(ids))
    assert np.all(np.isfinite(np.asarray(rate)))
    assert np.all(np.asarray(rate) > 0)


def test_bf16_conv_path_close_to_fp32():
    """compute_dtype=bfloat16 (the TIMES_MP_CONV analog) stays close to fp32."""

    common = dict(
        input_len=24, pred_len=4, d_model=8, d_ff=16, n_layers=1, k_periods=2,
        kernel_set=((3, 3),), dropout=0.0, mode="direct", min_period_threshold=2,
        c_in=1, id_vocab=2, id_embed_dim=4,
    )
    rng = np.random.default_rng(0)
    x = (3 + rng.standard_normal((4, 24, 1))).astype(np.float32)
    ids = np.zeros((4, 1), np.int32)
    m32 = TimesNet(TimesNetConfig(**common, compute_dtype="float32"))
    v = m32.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x), None, None,
                 jnp.asarray(ids))
    m16 = TimesNet(TimesNetConfig(**common, compute_dtype="bfloat16"))
    r32, d32 = m32.apply(v, jnp.asarray(x), None, None, jnp.asarray(ids))
    r16, d16 = m16.apply(v, jnp.asarray(x), None, None, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(r16), np.asarray(r32), rtol=5e-2, atol=5e-2)
    np.testing.assert_allclose(np.asarray(d16), np.asarray(d32), rtol=5e-2, atol=5e-2)
