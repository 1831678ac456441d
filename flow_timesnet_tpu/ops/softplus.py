"""Numerically-matched activations.

torch.nn.functional.softplus uses a linear passthrough above
``beta * x > threshold`` (threshold 20 in the reference heads,
``timesnet.py:2082, 2089``); jax.nn.softplus has no threshold, so we
reproduce the exact piecewise form for bit-comparable heads.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def softplus20(x: Array, beta: float = 1.0, threshold: float = 20.0) -> Array:
    scaled = beta * x
    safe = jnp.where(scaled > threshold, 0.0, scaled)
    return jnp.where(scaled > threshold, x, jnp.log1p(jnp.exp(safe)) / beta)
