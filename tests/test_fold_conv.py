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
