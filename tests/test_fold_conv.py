"""Masked dilated-tap convolution vs an explicit fold + Conv2d oracle.

The oracle reproduces the reference fold exactly: zero-pad the tail to a
multiple of p, reshape [B, C, cycles, p], run a 'same'-padded 2D convolution
(torch), and flatten back. tap_conv must match on the first L positions.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from flow_timesnet_tpu.ops.fold import make_geometry, pad_time, tap_conv


def _oracle(x, period, kernel, bias):
    """x: [B, L, C]; kernel: [kh, kw, Cin, Cout] -> [B, L, Cout]"""

    B, L, C = x.shape
    kh, kw, Cin, Cout = kernel.shape
    pad_len = (-L) % period
    xt = torch.from_numpy(np.transpose(x, (0, 2, 1)))  # [B, C, L]
    if pad_len:
        xt = F.pad(xt, (0, pad_len))
    total = L + pad_len
    grid = xt.reshape(B, C, total // period, period)
    w = torch.from_numpy(np.transpose(kernel, (3, 2, 0, 1)).copy())  # [Cout, Cin, kh, kw]
    b = torch.from_numpy(bias)
    out = F.conv2d(grid, w, b, padding=(kh // 2, kw // 2))
    out = out.reshape(B, Cout, total)[:, :, :L]
    return np.transpose(out.numpy(), (0, 2, 1))


@pytest.mark.parametrize("kh,kw", [(3, 3), (5, 5), (3, 5), (7, 7), (1, 3)])
@pytest.mark.parametrize("periods", [[7], [7, 5], [4, 13, 27]])
def test_tap_conv_matches_fold_conv2d(kh, kw, periods):
    rng = np.random.default_rng(0)
    B, L, Cin, Cout = 2, 28, 3, 4
    x = rng.standard_normal((B, L, Cin)).astype(np.float32)
    kernel = rng.standard_normal((kh, kw, Cin, Cout)).astype(np.float32) * 0.3
    bias = rng.standard_normal(Cout).astype(np.float32) * 0.1

    K = len(periods)
    p = jnp.asarray(periods, jnp.int32)
    geom = make_geometry(p, L, p_cap=L - 1)
    xg = pad_time(jnp.asarray(x), L, geom.Lp)
    h = jnp.broadcast_to(xg[None], (K, B, geom.Lp, Cin))
    out = tap_conv(h, geom, jnp.asarray(kernel), jnp.asarray(bias), kh, kw)
    out = np.asarray(out)[:, :, :L, :]

    for k, period in enumerate(periods):
        expected = _oracle(x, period, kernel, bias)
        np.testing.assert_allclose(out[k], expected, rtol=1e-4, atol=1e-5)


def test_tap_conv_tail_padding_is_zero():
    """Positions in the fold's zero-pad tail see zeros, like F.pad."""

    rng = np.random.default_rng(1)
    B, L, C = 1, 10, 2
    x = rng.standard_normal((B, L, C)).astype(np.float32)
    period = 7  # pad_len = 4, total = 14
    kernel = rng.standard_normal((3, 3, C, C)).astype(np.float32)
    bias = np.zeros(C, np.float32)
    geom = make_geometry(jnp.asarray([period], jnp.int32), L, p_cap=L - 1)
    xg = pad_time(jnp.asarray(x), L, geom.Lp)
    h = jnp.broadcast_to(xg[None], (1, B, geom.Lp, C))
    out = np.asarray(tap_conv(h, geom, jnp.asarray(kernel), jnp.asarray(bias), 3, 3))
    expected = _oracle(x, period, kernel, bias)
    np.testing.assert_allclose(out[0, :, :L, :], expected, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("kh,kw", [(3, 3), (5, 5), (1, 3), (7, 7)])
def test_tap_conv_custom_vjp_matches_autodiff(kh, kw):
    """The hand-written backward (tap-transpose + recomputed-stack dW) must
    match JAX's mechanical autodiff of the same forward math."""

    import jax

    rng = np.random.default_rng(3)
    K, B, L, Cin, Cout = 2, 3, 20, 4, 5
    periods = jnp.asarray([7, 13], jnp.int32)
    geom = make_geometry(periods, L, p_cap=L - 1)
    x = rng.standard_normal((B, L, Cin)).astype(np.float32)
    kernel = rng.standard_normal((kh, kw, Cin, Cout)).astype(np.float32) * 0.3
    bias = rng.standard_normal(Cout).astype(np.float32) * 0.1
    ct = rng.standard_normal((K, B, geom.Lp, Cout)).astype(np.float32)

    xg = pad_time(jnp.asarray(x), L, geom.Lp)
    h0 = jnp.broadcast_to(xg[None], (K, B, geom.Lp, Cin))

    def f(h, w, b):
        return jnp.sum(tap_conv(h, geom, w, b, kh, kw) * jnp.asarray(ct))

    # reference: autodiff through the raw (non-custom-vjp) forward math
    from flow_timesnet_tpu.ops import fold

    def f_raw(h, w, b):
        w_flat = w.reshape(kh, kw * Cin, Cout)
        out = fold._tap_matmul(
            h, geom.periods, geom.cycles, geom.col, geom.row,
            w_flat, kh, kw, geom.Lp, geom.L, 1,
        ) + b
        return jnp.sum(out * jnp.asarray(ct))

    args = (h0, jnp.asarray(kernel), jnp.asarray(bias))
    g_custom = jax.grad(f, argnums=(0, 1, 2))(*args)
    g_auto = jax.grad(f_raw, argnums=(0, 1, 2))(*args)
    for gc, ga, name in zip(g_custom, g_auto, ("dh", "dw", "db")):
        np.testing.assert_allclose(
            np.asarray(gc), np.asarray(ga), rtol=2e-5, atol=2e-5, err_msg=name
        )


def test_tap_conv_row_accumulation_grad_matches_fused():
    """Backward must be identical across the stack-size strategies."""

    import os

    import jax

    from flow_timesnet_tpu.ops import fold

    rng = np.random.default_rng(4)
    K, B, L, Cin, Cout = 2, 2, 16, 3, 3
    periods = jnp.asarray([5, 7], jnp.int32)
    geom = make_geometry(periods, L, p_cap=L - 1)
    x = rng.standard_normal((B, L, Cin)).astype(np.float32)
    kernel = rng.standard_normal((5, 5, Cin, Cout)).astype(np.float32) * 0.3
    bias = np.zeros(Cout, np.float32)
    xg = pad_time(jnp.asarray(x), L, geom.Lp)
    h0 = jnp.broadcast_to(xg[None], (K, B, geom.Lp, Cin))

    def loss(h, w):
        return jnp.sum(jnp.tanh(tap_conv(h, geom, w, jnp.asarray(bias), 5, 5)))

    g_fused = jax.grad(loss, argnums=(0, 1))(h0, jnp.asarray(kernel))
    old = fold._FULL_STACK_BYTES_LIMIT
    try:
        fold._FULL_STACK_BYTES_LIMIT = 1  # force per-row accumulation
        g_rows = jax.grad(loss, argnums=(0, 1))(h0, jnp.asarray(kernel))
    finally:
        fold._FULL_STACK_BYTES_LIMIT = old
    for a, b in zip(g_fused, g_rows):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_tap_conv_tapsum_strategy_matches_stack():
    """The stack-free per-tap strategy must reproduce fwd + grads exactly.

    ``FLOW_TIMESNET_FOLD_STRATEGY=tapsum`` replaces the tap-stack matmul with
    accumulated per-tap [Cin, Cout] matmuls (no stack materialization) — the
    math is a re-associated contraction, so values must agree to fp32
    accumulation tolerance.
    """

    import os

    import jax

    from flow_timesnet_tpu.ops import fold

    rng = np.random.default_rng(11)
    K, B, L, Cin, Cout = 2, 2, 14, 3, 4
    periods = jnp.asarray([4, 7], jnp.int32)
    geom = make_geometry(periods, L, p_cap=L - 1)
    x = rng.standard_normal((B, L, Cin)).astype(np.float32)
    kernel = rng.standard_normal((3, 5, Cin, Cout)).astype(np.float32) * 0.3
    bias = rng.standard_normal(Cout).astype(np.float32)
    xg = pad_time(jnp.asarray(x), L, geom.Lp)
    h0 = jnp.broadcast_to(xg[None], (K, B, geom.Lp, Cin))

    def loss(h, w, b):
        return jnp.sum(jnp.tanh(tap_conv(h, geom, w, b, 3, 5)))

    args = (h0, jnp.asarray(kernel), jnp.asarray(bias))
    out_stack = tap_conv(h0, geom, args[1], args[2], 3, 5)
    g_stack = jax.grad(loss, argnums=(0, 1, 2))(*args)
    os.environ["FLOW_TIMESNET_FOLD_STRATEGY"] = "tapsum"
    try:
        out_tap = tap_conv(h0, geom, args[1], args[2], 3, 5)
        g_tap = jax.grad(loss, argnums=(0, 1, 2))(*args)
    finally:
        del os.environ["FLOW_TIMESNET_FOLD_STRATEGY"]
    np.testing.assert_allclose(
        np.asarray(out_stack), np.asarray(out_tap), rtol=2e-6, atol=2e-6
    )
    for a, b, name in zip(g_stack, g_tap, ("dh", "dw", "db")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5, err_msg=name
        )
