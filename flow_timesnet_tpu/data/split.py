"""Train/validation splits over wide [T, N] frames.

Reference: ``/root/reference/src/timesnet_forecast/data/split.py``.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd


def make_holdout_slices(
    wide_df: pd.DataFrame, holdout_days: int
) -> Tuple[pd.DataFrame, pd.DataFrame]:
    """Split the last ``holdout_days`` rows off as the validation frame."""

    assert holdout_days > 0
    return wide_df.iloc[:-holdout_days].copy(), wide_df.iloc[-holdout_days:].copy()


def make_rolling_slices(
    wide_df: pd.DataFrame, folds: int, step_days: int, val_len: int
) -> Iterator[Tuple[pd.DataFrame, pd.DataFrame]]:
    """Yield (train, val) views with the val window stepping back from the tail.

    Fold ``k`` validates on rows ``[end - k*step - val_len, end - k*step)`` and
    trains on everything before; iteration stops once either side is empty.
    """

    end = len(wide_df)
    for k in range(folds):
        val_end = end - k * step_days
        val_start = max(0, val_end - val_len)
        trn = wide_df.iloc[:val_start]
        val = wide_df.iloc[val_start:val_end]
        if len(val) == 0 or len(trn) == 0:
            break
        yield trn, val
