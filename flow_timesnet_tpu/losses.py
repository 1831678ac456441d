"""Probabilistic losses (JAX).

Numerical parity target: the reference PyTorch NB2 negative log-likelihood at
``/root/reference/src/timesnet_forecast/losses.py:27-58`` — all computation in
float32, with a clamped valid-element mask and a denominator floor of 1.
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
from jax import Array

LOG_2PI = math.log(2.0 * math.pi)


def negative_binomial_mask(
    y: Array,
    rate: Array,
    dispersion: Array,
    mask: Optional[Array] = None,
) -> Array:
    """Boolean mask of elements with finite (y, rate, dispersion).

    A user mask with fewer dims than the target broadcasts from the left
    (trailing singleton dims), matching reference ``losses.py:6-24``.
    """

    finite = jnp.isfinite(y) & jnp.isfinite(rate) & jnp.isfinite(dispersion)
    if mask is not None:
        m = mask.astype(bool)
        while m.ndim < finite.ndim:
            m = m[..., None]
        finite = finite & m
    return finite


def negative_binomial_nll(
    y: Array,
    rate: Array,
    dispersion: Array,
    mask: Optional[Array] = None,
    eps: float = 1e-8,
) -> Array:
    """NB2 negative log-likelihood averaged over valid elements (float32).

    Parameterisation: mean ``mu = rate``, dispersion ``alpha`` with
    ``Var = mu + alpha * mu^2``. Log-likelihood per element::

        lgamma(y + 1/a) - lgamma(1/a) - lgamma(y + 1)
        - (1/a) * log1p(a*mu) + y * (log a + log mu - log1p(a*mu))
    """

    f32 = jnp.float32
    y32 = jnp.clip(y.astype(f32), 0.0, None)
    alpha = jnp.clip(dispersion.astype(f32), eps, None)
    mu = jnp.clip(rate.astype(f32), eps, None)

    log1p_am = jnp.log1p(alpha * mu)
    inv_alpha = 1.0 / alpha
    ll = (
        jax_lgamma(y32 + inv_alpha)
        - jax_lgamma(inv_alpha)
        - jax_lgamma(y32 + 1.0)
        - inv_alpha * log1p_am
        + y32 * (jnp.log(alpha) + jnp.log(mu) - log1p_am)
    )

    valid = negative_binomial_mask(y32, mu, alpha, mask)
    weight = valid.astype(f32)
    denom = jnp.clip(weight.sum(), 1.0, None)
    # Zero invalid elements before the reduce (NaN-safe; the reference's
    # ``(ll * weight).sum()`` would propagate NaN from masked entries).
    masked_ll = jnp.where(valid, ll, 0.0)
    return -masked_ll.sum() / denom


def gaussian_nll_loss(
    mu: Array,
    sigma: Array,
    target: Array,
    min_sigma: float | Array = 0.0,
) -> Array:
    """Element-wise Gaussian NLL in float32 with an optional sigma floor.

    Mirrors the legacy loss retained by the reference at ``train.py:107-145``;
    ``min_sigma`` may be a scalar or a broadcastable per-series floor.
    """

    f32 = jnp.float32
    mu32 = mu.astype(f32)
    sigma32 = sigma.astype(f32)
    target32 = target.astype(f32)
    if isinstance(min_sigma, (int, float)):
        if float(min_sigma) > 0.0:
            sigma32 = jnp.clip(sigma32, float(min_sigma), None)
    else:
        floor = jnp.asarray(min_sigma, dtype=f32)
        if floor.size > 0:
            sigma32 = jnp.maximum(sigma32, floor)
    z = (target32 - mu32) / sigma32
    return 0.5 * (z**2 + 2.0 * jnp.log(sigma32) + LOG_2PI)


def jax_lgamma(x: Array) -> Array:
    import jax.scipy.special as jsp

    return jsp.gammaln(x)
