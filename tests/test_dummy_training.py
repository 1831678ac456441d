"""Mini end-to-end training quality gate.

Mirrors the reference ``tests/test_dummy_training.py``: two synthetic
sinusoid series, 30 epochs, sMAPE and grouped wSMAPE must land below 0.1, and
the heads start zero-initialised (copy-last baseline).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from flow_timesnet_tpu.engine import Engine
from flow_timesnet_tpu.losses import negative_binomial_nll
from flow_timesnet_tpu.models.timesnet import TimesNetConfig
from flow_timesnet_tpu.utils.metrics import smape_mean, wsmape_grouped


def test_dummy_training_smape_wsmape():
    rng = np.random.default_rng(0)
    T, N, input_len, pred_len = 80, 2, 16, 4
    t = np.arange(T, dtype=np.float32)
    freqs = [2, 4]
    data = np.stack(
        [10 + np.sin(2 * math.pi * f * t / T) for f in freqs], axis=-1
    ).astype(np.float32)
    static_features = np.array(
        [[1.0, -0.5, 0.25], [0.5, 1.0, -0.75]], dtype=np.float32
    )
    series_ids = np.arange(N, dtype=np.int32)

    train_series = data[:60]
    Xs, Ys = [], []
    for i in range(len(train_series) - input_len - pred_len + 1):
        Xs.append(train_series[i : i + input_len])
        Ys.append(train_series[i + input_len : i + input_len + pred_len])
    X = np.stack(Xs)
    Y = np.stack(Ys)

    cfg = TimesNetConfig(
        input_len=input_len,
        pred_len=pred_len,
        d_model=16,
        d_ff=32,
        n_layers=2,
        k_periods=2,
        kernel_set=((3, 3),),
        dropout=0.0,
        activation="gelu",
        mode="direct",
        id_embed_dim=4,
        static_proj_dim=3,
        c_in=N,
        static_dim=3,
        id_vocab=N,
    )
    engine = Engine(cfg, use_loss_masking=False, weight_decay=0.0, num_series=N)

    def make_batch(xb, yb):
        return {
            "x": jnp.asarray(xb),
            "y": jnp.asarray(yb),
            "mask": jnp.ones_like(jnp.asarray(yb)),
            "x_mark": None,
            "y_mark": None,
            "static": jnp.asarray(static_features)[None].repeat(xb.shape[0], axis=0),
            "ids": jnp.asarray(series_ids)[None].repeat(xb.shape[0], axis=0),
            "row_valid": jnp.ones(xb.shape[0], jnp.float32),
        }

    state = engine.init_state(jax.random.PRNGKey(0), make_batch(X[:4], Y[:4]))

    # Heads must start zero-initialised (copy-last-step baseline behaviour).
    assert np.allclose(np.asarray(state.params["mu_head"]["kernel"]), 0.0)
    assert np.allclose(np.asarray(state.params["mu_head"]["bias"]), 0.0)
    assert np.allclose(np.asarray(state.params["sigma_head"]["kernel"]), 0.0)
    assert np.allclose(np.asarray(state.params["forecast_time_proj"]["kernel"][:-1]), 0.0)
    assert np.allclose(np.asarray(state.params["forecast_time_proj"]["kernel"][-1]), 1.0)

    for ep in range(30):
        idx = rng.permutation(X.shape[0])
        for j in range(0, len(idx), 4):
            sel = idx[j : j + 4]
            if len(sel) < 4:
                continue
            key = jax.random.PRNGKey(ep * 1000 + j)
            state, loss, _ = engine.train_step(
                state, 0.01, key, make_batch(X[sel], Y[sel]), True
            )

    input_seq = data[60 - input_len : 60][None]
    actual = data[60 : 60 + pred_len]
    rate, dispersion = engine.forward(
        state.params,
        jnp.asarray(input_seq),
        static=jnp.asarray(static_features)[None],
        ids=jnp.asarray(series_ids)[None],
    )
    assert np.all(np.asarray(rate) > 0)
    assert np.all(np.asarray(dispersion) > 0)

    y_pred = np.asarray(rate)[0]
    smape = smape_mean(actual, y_pred)
    wsmape = wsmape_grouped(actual, y_pred, ids=["A_1", "A_2"])
    assert smape < 0.1, smape
    assert wsmape < 0.1, wsmape


def test_eval_metrics_masked_nll_math():
    """Masked streaming NLL equals the closed-form masked mean."""

    rate = jnp.asarray([[[1.5, 2.0], [2.0, 4.0]]], jnp.float32)
    dispersion = jnp.full_like(rate, 0.5)
    target = jnp.asarray([[[1.0, 2.5], [3.0, 1.0]]], jnp.float32)
    mask = jnp.asarray([[[1.0, 0.0], [1.0, 1.0]]], jnp.float32)

    loss = negative_binomial_nll(target, rate, dispersion, mask > 0)
    manual = negative_binomial_nll(
        target, rate, dispersion, jnp.ones_like(mask, bool)
    )
    # with three valid of four elements the masked loss differs from unmasked
    assert not np.isclose(float(loss), float(manual))
    # denominators: masked mean over the 3 valid entries
    full = -np.asarray(
        [
            _nb_ll(1.0, 1.5, 0.5),
            _nb_ll(2.5, 2.0, 0.5),
            _nb_ll(3.0, 2.0, 0.5),
            _nb_ll(1.0, 4.0, 0.5),
        ]
    )
    expected = (full[0] + full[2] + full[3]) / 3.0
    assert abs(float(loss) - expected) < 1e-5


def _nb_ll(y, mu, alpha):
    from scipy.special import gammaln

    inv_a = 1.0 / alpha
    return (
        gammaln(y + inv_a)
        - gammaln(inv_a)
        - gammaln(y + 1.0)
        - inv_a * np.log1p(alpha * mu)
        + y * (np.log(alpha) + np.log(mu) - np.log1p(alpha * mu))
    )
