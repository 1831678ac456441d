"""Calendar covariates from a DatetimeIndex.

Behavioural parity with the reference extractor
(``/root/reference/src/timesnet_forecast/utils/time_features.py``):
the same feature set, the same (value, period) conventions, and the same
cyclical/onehot/numeric encodings with optional normalisation.
"""

from __future__ import annotations

from typing import Any, List, Mapping, Sequence, Union

import numpy as np
import pandas as pd

DEFAULT_FEATURES: List[str] = ["day_of_week", "day_of_month", "month", "day_of_year"]

# feature name -> (extractor over DatetimeIndex, period)
_EXTRACTORS = {
    "day_of_week": (lambda idx: idx.dayofweek.to_numpy(), 7),
    "day_of_month": (lambda idx: idx.day.to_numpy() - 1, 31),
    "month": (lambda idx: idx.month.to_numpy() - 1, 12),
    "hour": (lambda idx: idx.hour.to_numpy(), 24),
    "minute": (lambda idx: idx.minute.to_numpy(), 60),
    "day_of_year": (lambda idx: idx.dayofyear.to_numpy() - 1, 366),
    "week_of_year": (lambda idx: np.asarray(idx.isocalendar().week) - 1, 53),
}


def _encoding_for(feature: str, encoding: Any) -> str:
    if isinstance(encoding, Mapping):
        value = encoding.get(feature, encoding.get("default", "cyclical"))
    else:
        value = encoding
    enc = str(value).lower()
    if enc not in {"cyclical", "onehot", "numeric"}:
        raise ValueError(
            f"Unsupported encoding '{value}' for feature '{feature}'. "
            "Expected 'cyclical', 'onehot', or 'numeric'."
        )
    return enc


def _encode(values: np.ndarray, period: int, encoding: str, normalize: bool) -> np.ndarray:
    values = np.asarray(values).reshape(-1).astype(np.int64)
    if period <= 0:
        period = max(int(values.max(initial=0) - values.min(initial=0) + 1), 1)
    mod = np.mod(values, period)
    if encoding == "cyclical":
        angles = 2.0 * np.pi * (mod.astype(np.float32) / float(max(period, 1)))
        return np.stack([np.sin(angles), np.cos(angles)], axis=1).astype(np.float32)
    if encoding == "onehot":
        onehot = np.zeros((values.size, period), dtype=np.float32)
        if values.size:
            onehot[np.arange(values.size), mod] = 1.0
        return onehot
    numeric = mod.astype(np.float32)
    if normalize and period > 1:
        numeric = numeric / float(period - 1)
    return numeric.reshape(-1, 1)


def build_time_features(
    index: Union[pd.DatetimeIndex, Sequence],
    config: Mapping[str, Any] | None,
    *,
    return_names: bool = False,
):
    """Build a float32 [T, F] covariate matrix from a datetime index."""

    cfg = dict(config or {})
    idx = index if isinstance(index, pd.DatetimeIndex) else pd.to_datetime(np.asarray(index))
    if not bool(cfg.get("enabled", False)):
        empty = np.zeros((len(idx), 0), dtype=np.float32)
        return (empty, []) if return_names else empty

    features = cfg.get("features") or DEFAULT_FEATURES
    encoding_cfg = cfg.get("encoding", "cyclical")
    normalize = bool(cfg.get("normalize", True))

    blocks: List[np.ndarray] = []
    names: List[str] = []
    for feature in features:
        spec = _EXTRACTORS.get(feature)
        if spec is None:
            raise ValueError(f"Unsupported time feature '{feature}'.")
        extractor, period = spec
        values = extractor(idx).astype(np.int64)
        enc = _encoding_for(feature, encoding_cfg)
        block = _encode(values, period, enc, normalize)
        if block.size == 0:
            continue
        blocks.append(block)
        if enc == "cyclical":
            names += [f"{feature}_sin", f"{feature}_cos"]
        elif enc == "onehot":
            names += [f"{feature}_{i}" for i in range(block.shape[1])]
        else:
            names.append(feature)

    if not blocks:
        empty = np.zeros((len(idx), 0), dtype=np.float32)
        return (empty, []) if return_names else empty
    matrix = np.hstack(blocks).astype(np.float32)
    return (matrix, names) if return_names else matrix
