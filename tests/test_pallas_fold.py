"""Pallas tap-conv kernel parity vs the XLA tap_conv (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from flow_timesnet_tpu.ops.fold import make_geometry, pad_time, tap_conv
from flow_timesnet_tpu.ops.pallas_fold import tap_conv_pallas


@pytest.mark.parametrize("kh,kw", [(3, 3), (5, 5), (1, 3)])
@pytest.mark.parametrize("periods", [[7], [4, 13, 27]])
def test_pallas_matches_xla_tap_conv(kh, kw, periods):
    rng = np.random.default_rng(0)
    B, L, Cin, Cout = 4, 28, 8, 8
    x = rng.standard_normal((B, L, Cin)).astype(np.float32)
    kernel = rng.standard_normal((kh, kw, Cin, Cout)).astype(np.float32) * 0.3
    bias = rng.standard_normal(Cout).astype(np.float32) * 0.1

    K = len(periods)
    geom = make_geometry(jnp.asarray(periods, jnp.int32), L, p_cap=L - 1)
    xg = pad_time(jnp.asarray(x), L, geom.Lp)
    h = jnp.broadcast_to(xg[None], (K, B, geom.Lp, Cin))
    expected = np.asarray(tap_conv(h, geom, jnp.asarray(kernel), jnp.asarray(bias), kh, kw))
    got = np.asarray(
        tap_conv_pallas(h, geom, jnp.asarray(kernel), jnp.asarray(bias), kh, kw,
                        interpret=True)
    )
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def test_pallas_b_tiling_variants():
    rng = np.random.default_rng(1)
    B, L, Cin, Cout = 8, 16, 4, 6
    x = rng.standard_normal((B, L, Cin)).astype(np.float32)
    kernel = rng.standard_normal((3, 3, Cin, Cout)).astype(np.float32)
    bias = np.zeros(Cout, np.float32)
    geom = make_geometry(jnp.asarray([5, 7], jnp.int32), L, p_cap=L - 1)
    xg = pad_time(jnp.asarray(x), L, geom.Lp)
    h = jnp.broadcast_to(xg[None], (2, B, geom.Lp, Cin))
    expected = np.asarray(tap_conv(h, geom, jnp.asarray(kernel), jnp.asarray(bias), 3, 3))
    for b_tile in (1, 2, 4, 8):
        got = np.asarray(
            tap_conv_pallas(h, geom, jnp.asarray(kernel), jnp.asarray(bias), 3, 3,
                            interpret=True, b_tile=b_tile)
        )
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def test_pallas_gradients_match_xla():
    import jax

    rng = np.random.default_rng(2)
    B, L, Cin, Cout = 2, 16, 4, 4
    x = rng.standard_normal((B, L, Cin)).astype(np.float32)
    kernel = rng.standard_normal((3, 3, Cin, Cout)).astype(np.float32)
    bias = rng.standard_normal(Cout).astype(np.float32)
    geom = make_geometry(jnp.asarray([5], jnp.int32), L, p_cap=L - 1)
    xg = pad_time(jnp.asarray(x), L, geom.Lp)
    h = jnp.broadcast_to(xg[None], (1, B, geom.Lp, Cin))

    def loss_pallas(h_, k_, b_):
        return jnp.sum(
            tap_conv_pallas(h_, geom, k_, b_, 3, 3, interpret=True) ** 2
        )

    def loss_xla(h_, k_, b_):
        return jnp.sum(tap_conv(h_, geom, k_, b_, 3, 3) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(h, jnp.asarray(kernel), jnp.asarray(bias))
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(h, jnp.asarray(kernel), jnp.asarray(bias))
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("kh,kw,periods", [(3, 3, [5]), (5, 5, [4, 7]), (3, 5, [6, 11, 3])])
def test_pallas_backward_kernel_matches_xla(kh, kw, periods, monkeypatch):
    """FLOW_TIMESNET_PALLAS_BWD=1 routes dL/dh through the same Pallas kernel
    with negated shifts + transposed masks; gradients must equal the XLA VJP
    (VERDICT r2 #9 fwd+bwd experiment)."""

    import jax

    monkeypatch.setenv("FLOW_TIMESNET_PALLAS_BWD", "1")
    rng = np.random.default_rng(7)
    K, B, L, Cin, Cout = len(periods), 2, 18, 4, 4
    x = rng.standard_normal((B, L, Cin)).astype(np.float32)
    kernel = rng.standard_normal((kh, kw, Cin, Cout)).astype(np.float32)
    bias = rng.standard_normal(Cout).astype(np.float32)
    geom = make_geometry(jnp.asarray(periods, jnp.int32), L, p_cap=L - 1)
    xg = pad_time(jnp.asarray(x), L, geom.Lp)
    h = jnp.broadcast_to(xg[None], (K, B, geom.Lp, Cin))
    ct = rng.standard_normal((K, B, geom.Lp, Cout)).astype(np.float32)

    def loss_pallas(h_, k_, b_):
        return jnp.sum(
            tap_conv_pallas(h_, geom, k_, b_, kh, kw, interpret=True) * jnp.asarray(ct)
        )

    def loss_xla(h_, k_, b_):
        return jnp.sum(tap_conv(h_, geom, k_, b_, kh, kw) * jnp.asarray(ct))

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(h, jnp.asarray(kernel), jnp.asarray(bias))
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(h, jnp.asarray(kernel), jnp.asarray(bias))
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)
