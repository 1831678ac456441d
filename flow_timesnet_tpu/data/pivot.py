"""Long→wide pivoting, id normalisation, per-series scalers.

Parity targets in the reference: ``pivot_long_to_wide`` / ``normalize_id`` /
``fit_series_scaler`` / ``inverse_transform``
(``/root/reference/src/timesnet_forecast/utils/io.py:494-621``) and the
fitted-scaler application ``_transform_dataframe`` (``train.py:569-592``).

Scalers are stored as vectorised numpy arrays keyed by column order (plus the
id→params dict for artifact compatibility with the reference pickle layout).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd

ScalerDict = Dict[str, Tuple[float, float]]


def normalize_id(name: str) -> str:
    """Collapse whitespace runs to single underscores; keep unicode as-is."""

    collapsed = " ".join(str(name).split())
    return collapsed.strip().replace(" ", "_")


# Alias used by submission handling.
normalize_series_name = normalize_id


def build_id_col(df: pd.DataFrame, id_col: str) -> pd.Series:
    # vectorised normalize_id: whitespace runs -> single underscore
    return df[id_col].astype(str).str.split().str.join("_")


def _fill_grid(index: pd.DatetimeIndex) -> Optional[pd.DatetimeIndex]:
    """Dense timestamp grid for ``fill_missing_dates``, at the index's own resolution.

    Date-like indexes (every stamp at midnight) keep the reference semantics —
    fill missing calendar DAYS (reference ``utils/io.py:494-540`` only ever
    sees daily data). Sub-daily indexes (e.g. the hourly long-context
    benchmark) fill at the smallest observed spacing instead; reindexing an
    hourly index onto a daily grid would silently DROP every non-midnight row
    (2400 hourly rows collapsed to 100 daily ones before this guard). If the
    observed stamps don't all lie on that grid (irregular sampling), return
    ``None`` — no fill beats data loss.
    """

    idx = pd.DatetimeIndex(index)
    if len(idx) < 2:
        return None
    if (idx == idx.normalize()).all():
        return pd.date_range(idx.min(), idx.max(), freq="D")
    step = np.diff(idx.values).min()  # index is sorted unique by construction
    full = pd.date_range(idx[0], idx[-1], freq=pd.Timedelta(step))
    if len(full) == len(idx) or not idx.isin(full).all():
        return None
    return full


def pivot_long_to_wide(
    df: pd.DataFrame,
    date_col: str,
    id_col: str,
    target_col: str,
    fill_missing_dates: bool = True,
    fillna0: bool = True,
) -> pd.DataFrame:
    """Pivot a long (date, id, target) frame to a wide [T, N] frame.

    Missing calendar days are reindexed at daily frequency when requested;
    columns are sorted by (normalised) id. Implemented as a vectorised
    factorize + scatter (one pass over the rows) rather than
    ``DataFrame.pivot`` — an order of magnitude faster on
    many-series long frames, with identical semantics including the
    duplicate-(date, id) error.
    """

    # factorize the raw columns first and parse/normalise only the uniques
    # (dates repeat ~N-fold and ids ~T-fold in long frames)
    raw_date_codes, raw_dates = pd.factorize(df[date_col], sort=False)
    parsed_dates = pd.to_datetime(pd.Index(raw_dates))
    date_order = np.argsort(parsed_dates.values, kind="stable")
    date_index = parsed_dates[date_order]
    date_rank = np.empty(len(date_order), dtype=np.int64)
    date_rank[date_order] = np.arange(len(date_order))
    date_codes = date_rank[raw_date_codes]

    raw_id_codes, raw_ids = pd.factorize(df[id_col], sort=False)
    normed_ids = build_id_col(pd.DataFrame({id_col: raw_ids}), id_col)
    # normalisation can merge distinct raw ids; re-factorize the normed uniques
    id_sub_codes, id_index_arr = pd.factorize(normed_ids, sort=True)
    id_codes = id_sub_codes[raw_id_codes]
    id_index = pd.Index(id_index_arr)
    T, N = len(date_index), len(id_index)
    filled = np.zeros((T, N), dtype=bool)
    filled[date_codes, id_codes] = True
    if int(filled.sum()) != len(df):
        raise ValueError(
            "Index contains duplicate entries, cannot reshape: the same "
            "(date, id) pair appears more than once"
        )
    values = np.full((T, N), np.nan, dtype=float)
    values[date_codes, id_codes] = pd.to_numeric(df[target_col]).to_numpy(dtype=float)
    wide = pd.DataFrame(values, index=pd.DatetimeIndex(date_index), columns=list(id_index))
    if fill_missing_dates:
        full_idx = _fill_grid(wide.index)
        if full_idx is not None:
            wide = wide.reindex(full_idx)
    if fillna0:
        wide = wide.fillna(0.0)
    wide.index.name = None
    wide.columns.name = None
    return wide


def read_long_pivot(
    path: str,
    date_col: str,
    id_col: str,
    target_col: str,
    fill_missing_dates: bool = True,
    fillna0: bool = True,
    encoding: str = "utf-8",
) -> pd.DataFrame:
    """``pd.read_csv`` + :func:`pivot_long_to_wide` with a native fast path.

    The C++ engine (``runtime/csv_pivot.cpp``) parses and pivots the long
    frame in one pass — no intermediate DataFrame — and returns the dense
    [T, N] grid directly. It only speaks the strict dialect (UTF-8,
    ISO dates, plain floats); anything else makes it decline and this
    function falls back to the pandas path, which defines the semantics.
    A duplicate-(date, id) report from the native engine also falls back so
    the pandas path raises the identical ValueError.
    """

    wide = _native_read_long_pivot(
        path, date_col, id_col, target_col, fill_missing_dates, encoding
    )
    if wide is None:
        df = pd.read_csv(path, encoding=encoding)
        return pivot_long_to_wide(
            df,
            date_col=date_col,
            id_col=id_col,
            target_col=target_col,
            fill_missing_dates=fill_missing_dates,
            fillna0=fillna0,
        )
    return wide.fillna(0.0) if fillna0 else wide


def _native_read_long_pivot(
    path: str,
    date_col: str,
    id_col: str,
    target_col: str,
    fill_missing_dates: bool,
    encoding: str,
) -> Optional[pd.DataFrame]:
    if encoding.lower().replace("_", "-") not in ("utf-8", "utf8", "ascii", "utf-8-sig"):
        return None
    from ..runtime.native import get_native_csv_pivot

    engine = get_native_csv_pivot()
    if engine is None:
        return None
    import csv as _csv

    try:
        with open(path, "r", encoding="utf-8-sig", newline="") as f:
            header = next(_csv.reader(f))
    except (OSError, StopIteration, UnicodeDecodeError, _csv.Error):
        return None
    try:
        idx = [header.index(c) for c in (date_col, id_col, target_col)]
    except ValueError:
        return None  # missing columns: pandas path raises the right error
    result = engine.parse(path, *idx)
    if isinstance(result, int):  # any CP_E_* status, incl. duplicates
        return None
    values, filled, days, ids = result
    values[~filled] = np.nan  # already float64 through the ABI
    index = pd.DatetimeIndex(days.astype("datetime64[D]"))
    wide = pd.DataFrame(values, index=index, columns=ids)
    if fill_missing_dates and len(index):
        full_idx = pd.date_range(index.min(), index.max(), freq="D")
        if len(full_idx) != len(index):
            wide = wide.reindex(full_idx)
    wide.index.name = None
    wide.columns.name = None
    return wide


def fit_series_scaler(
    wide_df: pd.DataFrame,
    method: str = "zscore",
    per_series: bool = True,
    eps: float = 1e-8,
) -> Tuple[Optional[ScalerDict], pd.DataFrame]:
    """Fit a zscore/minmax scaler and return (scaler, normalised frame).

    zscore stores (mean, std) per column; minmax stores (min, max); degenerate
    spreads fall back to unit scale. ``per_series=False`` fits one global pair
    applied to every column.
    """

    ids = list(wide_df.columns)
    if method == "none":
        return None, wide_df.copy()
    values = wide_df.values.astype(np.float32)
    scaler: ScalerDict = {}
    if per_series:
        if method == "zscore":
            mu = np.mean(values, axis=0)
            sd = np.std(values, axis=0)
            sd = np.where(sd < eps, 1.0, sd)
            normed = (values - mu) / sd
            for j, c in enumerate(ids):
                scaler[c] = (float(mu[j]), float(sd[j]))
        elif method == "minmax":
            lo = np.min(values, axis=0)
            hi = np.max(values, axis=0)
            rng = np.where((hi - lo) < eps, 1.0, hi - lo)
            normed = (values - lo) / rng
            for j, c in enumerate(ids):
                scaler[c] = (float(lo[j]), float(hi[j]))
        else:
            raise ValueError(f"Unknown scaler method '{method}'")
    else:
        if method == "zscore":
            mu = float(np.mean(values))
            sd = float(np.std(values))
            sd = sd if sd >= eps else 1.0
            normed = (values - mu) / sd
            params = (mu, sd)
        elif method == "minmax":
            lo = float(np.min(values))
            hi = float(np.max(values))
            rng = (hi - lo) if (hi - lo) >= eps else 1.0
            normed = (values - lo) / rng
            params = (lo, hi)
        else:
            raise ValueError(f"Unknown scaler method '{method}'")
        for c in ids:
            scaler[c] = params
    return scaler, pd.DataFrame(normed, index=wide_df.index, columns=ids)


def scaler_arrays(
    ids: List[str], scaler: Optional[ScalerDict], method: str
) -> Tuple[np.ndarray, np.ndarray]:
    """Vectorise a scaler dict into per-column (shift, scale) arrays.

    The transform is always expressed as ``(x - shift) / scale`` and its
    inverse as ``x * scale + shift``.
    """

    n = len(ids)
    shift = np.zeros(n, dtype=np.float32)
    scale = np.ones(n, dtype=np.float32)
    if scaler is None or method == "none":
        return shift, scale
    for j, c in enumerate(ids):
        a, b = scaler[c]
        if method == "zscore":
            shift[j] = a
            scale[j] = b if b != 0 else 1.0
        elif method == "minmax":
            rng = (b - a) if (b - a) != 0 else 1.0
            shift[j] = a
            scale[j] = rng
        else:
            raise ValueError(f"Unknown scaler method '{method}'")
    return shift, scale


def transform_array(
    values: np.ndarray, ids: List[str], scaler: Optional[ScalerDict], method: str
) -> np.ndarray:
    """Apply a fitted scaler to a [T, N] array column-wise."""

    if method == "none" or scaler is None:
        return values.astype(np.float32, copy=True)
    shift, scale = scaler_arrays(ids, scaler, method)
    return ((values.astype(np.float32) - shift[None, :]) / scale[None, :]).astype(np.float32)


def transform_dataframe(
    df: pd.DataFrame, ids: List[str], scaler: Optional[ScalerDict], method: str
) -> pd.DataFrame:
    if method == "none" or scaler is None:
        return df.copy()
    out = transform_array(df.to_numpy(dtype=np.float32, copy=True), ids, scaler, method)
    return pd.DataFrame(out, index=df.index, columns=ids)


def inverse_transform(
    arr: np.ndarray, ids: List[str], scaler: Optional[ScalerDict], method: str
) -> np.ndarray:
    """Invert the fitted scaler on a [T_or_H, N] array."""

    if method == "none" or scaler is None:
        return arr.astype(np.float32, copy=True)
    shift, scale = scaler_arrays(ids, scaler, method)
    return (arr.astype(np.float32) * scale[None, :] + shift[None, :]).astype(np.float32)
