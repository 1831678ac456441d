"""Forecast accuracy metrics.

Numpy implementations mirror the reference semantics
(``/root/reference/src/timesnet_forecast/utils/metrics.py``); the jitted
streaming accumulators are the TPU-native replacements for the reference's
host-side per-(batch, series) python loops (``train.py:756-760``).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from jax import Array


def smape_mean(y_true: np.ndarray, y_pred: np.ndarray, eps: float = 1e-8) -> float:
    """Mean symmetric MAPE over points where ``|y_true| > eps``."""

    assert y_true.shape == y_pred.shape, "y_true and y_pred must have same shape"
    mask = np.abs(y_true) > eps
    if not np.any(mask):
        return 0.0
    denom = np.abs(y_true) + np.abs(y_pred)
    vals = 2.0 * np.abs(y_pred - y_true)[mask] / denom[mask]
    return float(np.mean(vals))


def wsmape_grouped(
    y_true: np.ndarray,
    y_pred: np.ndarray,
    ids: List[str],
    weights: Optional[Dict[str, float]] = None,
    eps: float = 1e-8,
) -> float:
    """Store-weighted SMAPE; store key = ``id.split('_', 1)[0]``.

    Per item, only timepoints with a non-zero actual contribute; items with no
    valid points score 0. Store scores are the mean over their items; the
    final score is the (normalised) weighted sum over stores.
    """

    assert y_true.shape == y_pred.shape and y_true.ndim == 2
    stores = [s.split("_", 1)[0] for s in ids]
    by_store: Dict[str, List[int]] = {}
    for j, store in enumerate(stores):
        by_store.setdefault(store, []).append(j)

    if weights is None:
        weights = {store: 1.0 for store in by_store}
    total_w = sum(weights.values()) or 1.0

    def item_smape(a: np.ndarray, p: np.ndarray) -> float:
        keep = np.abs(a) > eps
        a, p = a[keep], p[keep]
        if a.size == 0:
            return 0.0
        denom = np.abs(a) + np.abs(p)
        keep2 = denom > eps
        if not np.any(keep2):
            return 0.0
        return float(np.mean(2.0 * np.abs(a[keep2] - p[keep2]) / denom[keep2]))

    score = 0.0
    for store, cols in by_store.items():
        if not cols:
            continue
        item_scores = [item_smape(y_true[:, j], y_pred[:, j]) for j in cols]
        w = weights.get(store, 0.0) / total_w
        score += w * float(np.mean(item_scores))
    return float(score)


# ---------------------------------------------------------------------------
# Jitted streaming accumulators (device-side evaluation)
# ---------------------------------------------------------------------------


def smape_batch_sums(y: Array, pred: Array, eps: float = 1e-8) -> Tuple[Array, Array]:
    """Streaming ``(sum, count)`` contribution for :func:`smape_mean`.

    ``y``/``pred`` must already have masked-invalid entries zeroed so the
    ``|y| > eps`` gate excludes them, matching the host implementation.
    """

    y32 = y.astype(jnp.float32)
    p32 = pred.astype(jnp.float32)
    gate = jnp.abs(y32) > eps
    denom = jnp.abs(y32) + jnp.abs(p32)
    term = jnp.where(gate, 2.0 * jnp.abs(p32 - y32) / jnp.where(gate, denom, 1.0), 0.0)
    return term.sum(), gate.astype(jnp.float32).sum()


def wsmape_batch_sums(
    y: Array, pred: Array, series_idx: Array, num_series: int, eps: float = 1e-8
) -> Tuple[Array, Array]:
    """Per-series streaming ``(sums[N], counts[N])`` for grouped wSMAPE.

    ``y``/``pred`` are ``[B, H, N]`` with masked entries zeroed,
    ``series_idx`` is ``[B, N]`` integer ids into the global series list.
    """

    y32 = y.astype(jnp.float32)
    p32 = pred.astype(jnp.float32)
    gate = (jnp.abs(y32) > eps) & ((jnp.abs(y32) + jnp.abs(p32)) > eps)
    denom = jnp.where(gate, jnp.abs(y32) + jnp.abs(p32), 1.0)
    term = jnp.where(gate, 2.0 * jnp.abs(y32 - p32) / denom, 0.0)
    flat_idx = jnp.broadcast_to(series_idx[:, None, :], y32.shape).reshape(-1)
    sums = jnp.zeros(num_series, jnp.float32).at[flat_idx].add(term.reshape(-1))
    counts = jnp.zeros(num_series, jnp.float32).at[flat_idx].add(
        gate.astype(jnp.float32).reshape(-1)
    )
    return sums, counts


def wsmape_from_series_sums(
    sums: np.ndarray,
    counts: np.ndarray,
    ids: List[str],
    weights: Optional[Dict[str, float]] = None,
) -> float:
    """Finalize grouped wSMAPE from per-series streaming accumulators."""

    per_item = np.where(counts > 0, sums / np.maximum(counts, 1.0), 0.0)
    stores = [s.split("_", 1)[0] for s in ids]
    by_store: Dict[str, List[int]] = {}
    for j, store in enumerate(stores):
        by_store.setdefault(store, []).append(j)
    if weights is None:
        weights = {store: 1.0 for store in by_store}
    total_w = sum(weights.values()) or 1.0
    score = 0.0
    for store, cols in by_store.items():
        if not cols:
            continue
        score += (weights.get(store, 0.0) / total_w) * float(np.mean(per_item[cols]))
    return float(score)
