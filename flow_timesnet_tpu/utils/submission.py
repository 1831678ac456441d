"""Submission writers (strategy registry).

Same output contracts as the reference
(``/root/reference/src/timesnet_forecast/utils/submission.py``): a
``row_key`` wide format mirroring the sample submission, and a
``date_menu`` format keyed by actual forecast dates. Missing rows follow the
``warn_fill`` / ``error`` policy; menu columns are normalised series names
mapped back to the sample's original headers.
"""

from __future__ import annotations

import logging
from abc import ABC, abstractmethod
from dataclasses import dataclass
from typing import Dict, List, Mapping, Optional, Sequence, Type

import numpy as np
import pandas as pd

from ..data.pivot import normalize_series_name
from .artifacts import parse_row_key

logger = logging.getLogger(__name__)


@dataclass
class SubmissionRowMeta:
    test_part: str
    step: int
    date: Optional[pd.Timestamp] = None
    source: Optional[str] = None


@dataclass
class SubmissionContext:
    predictions_columns: List[str]
    row_meta: Mapping[str, SubmissionRowMeta]
    row_order: List[str]
    test_parts: Mapping[str, Sequence[str]]
    ids: Sequence[str]
    output_order: List[str]
    normalized_to_output: Mapping[str, str]
    sample_df: Optional[pd.DataFrame]
    row_key_column: str
    date_column: str
    default_fill_value: float
    new_ids: Sequence[str]
    missing_ids: Sequence[str]
    missing_by_part: Mapping[str, Sequence[str]]

    @property
    def output_columns(self) -> List[str]:
        return [self.normalized_to_output.get(c, c) for c in self.output_order]


class SubmissionWriter(ABC):
    """Render predictions into a submission frame; subclasses pick the layout."""

    missing_policy: str = "warn_fill"

    def __init__(
        self,
        *,
        default_fill_value: float = 0.0,
        missing_policy: Optional[str] = None,
    ) -> None:
        self.default_fill_value = default_fill_value
        if missing_policy:
            self.missing_policy = str(missing_policy)

    def render(self, predictions: pd.DataFrame, context: SubmissionContext) -> pd.DataFrame:
        required = [c for c in context.output_order if c not in context.new_ids]
        missing = [c for c in required if c not in predictions.columns]
        if missing:
            raise ValueError("Predictions missing required columns: " + ", ".join(missing))
        out = self._fill(predictions, context)
        expected = self._expected_columns(context)
        if list(out.columns) != expected:
            raise ValueError(
                f"Submission output columns mismatch; expected {expected} "
                f"but received {list(out.columns)}"
            )
        if len(out) != len(context.row_order):
            raise ValueError(
                f"Submission row count mismatch; expected {len(context.row_order)} rows "
                f"but received {len(out)}"
            )
        return out

    def _defaults(self, context: SubmissionContext) -> List[float]:
        return [self.default_fill_value] * len(context.output_order)

    def _missing_row(self, row_key: str, context: SubmissionContext, reason: str) -> List[float]:
        if self.missing_policy == "error":
            raise KeyError(f"Missing prediction for {row_key} ({reason})")
        logger.warning("Missing prediction for %s (%s); filling defaults", row_key, reason)
        return self._defaults(context)

    def _values_matrix(
        self,
        predictions: pd.DataFrame,
        row_keys: Sequence[Optional[str]],
        context: SubmissionContext,
    ) -> "np.ndarray":
        """[len(row_keys), n_output] float matrix aligned to ``output_order``.

        One vectorised ``reindex`` instead of a per-(row, column) lookup —
        the per-cell path was quadratic-feeling in pandas and took >1 h at
        10k series. Semantics preserved exactly: rows whose key is ``None``
        (caller already dispatched the missing policy) or absent from
        ``predictions`` become default-filled; columns absent from
        ``predictions`` fill with the default; NaNs in *present* columns
        pass through untouched (as ``Series.get`` did).
        """

        aligned = predictions.reindex(
            index=pd.Index(k if k is not None else "\0missing" for k in row_keys),
            columns=context.output_order,
        )
        values = aligned.to_numpy(dtype=float, copy=True)
        present = predictions.columns
        col_missing = [
            j for j, c in enumerate(context.output_order) if c not in present
        ]
        if col_missing:
            values[:, col_missing] = self.default_fill_value
        row_missing = [
            i
            for i, k in enumerate(row_keys)
            if k is None or k not in predictions.index
        ]
        if row_missing:
            values[row_missing, :] = self.default_fill_value
        return values

    @abstractmethod
    def _expected_columns(self, context: SubmissionContext) -> List[str]:
        ...

    @abstractmethod
    def _fill(self, predictions: pd.DataFrame, context: SubmissionContext) -> pd.DataFrame:
        ...


class RowKeyLongWriter(SubmissionWriter):
    """Wide submission keyed by row_key; follows the sample template rows."""

    def _expected_columns(self, context: SubmissionContext) -> List[str]:
        return [context.row_key_column, *context.output_columns]

    def _fill(self, predictions: pd.DataFrame, context: SubmissionContext) -> pd.DataFrame:
        if context.sample_df is not None:
            df = context.sample_df.copy()
            # sample templates often carry integer zeros; predictions are float
            df[context.output_columns] = df[context.output_columns].astype(float)
        else:
            df = pd.DataFrame({context.row_key_column: list(context.row_order)})
            for column in context.output_columns:
                df[column] = context.default_fill_value
        canon: List[Optional[str]] = []
        for raw in df[context.row_key_column]:
            try:
                part, step = parse_row_key(str(raw))
                row_key = f"{part}+D{int(step)}"
            except Exception:  # noqa: BLE001
                self._missing_row(str(raw), context, "invalid_row_key")
                canon.append(None)
                continue
            if row_key not in context.row_meta:
                self._missing_row(row_key, context, "unknown_row")
                canon.append(None)
            elif row_key not in predictions.index:
                self._missing_row(row_key, context, "missing_prediction")
                canon.append(None)
            else:
                canon.append(row_key)
        df[context.output_columns] = self._values_matrix(predictions, canon, context)
        return df


class DateMenuWriter(SubmissionWriter):
    """Submission with actual forecast dates in the first column."""

    def _expected_columns(self, context: SubmissionContext) -> List[str]:
        return [context.date_column, *context.output_columns]

    def _fill(self, predictions: pd.DataFrame, context: SubmissionContext) -> pd.DataFrame:
        dates = []
        canon: List[Optional[str]] = []
        for row_key in context.row_order:
            meta = context.row_meta.get(row_key)
            dates.append(meta.date if meta and meta.date is not None else row_key)
            if row_key in predictions.index:
                canon.append(row_key)
            else:
                self._missing_row(row_key, context, "missing_prediction")
                canon.append(None)
        values = self._values_matrix(predictions, canon, context)
        out = pd.DataFrame(values, columns=context.output_columns)
        out.insert(0, context.date_column, dates)
        return out


WRITER_REGISTRY: Dict[str, Type[SubmissionWriter]] = {
    "date_menu": DateMenuWriter,
    "row_key": RowKeyLongWriter,
    "row_key_long": RowKeyLongWriter,
}


def get_submission_writer(name: str) -> Type[SubmissionWriter]:
    key = (name or "date_menu").lower()
    if key not in WRITER_REGISTRY:
        raise KeyError(f"Unknown submission writer format '{name}'")
    return WRITER_REGISTRY[key]


def build_submission_context(
    *,
    predictions: pd.DataFrame,
    sample_df: Optional[pd.DataFrame],
    row_meta: Mapping[str, SubmissionRowMeta],
    row_order: Sequence[str],
    test_parts: Mapping[str, Sequence[str]],
    ids: Sequence[str],
    new_ids: Sequence[str],
    missing_ids: Sequence[str],
    missing_by_part: Mapping[str, Sequence[str]],
    submission_cfg: Mapping[str, object],
) -> SubmissionContext:
    default_fill_value = float(submission_cfg.get("default_fill_value", 0.0) or 0.0)
    date_column = str(submission_cfg.get("date_col", "date"))
    row_key_column = str(submission_cfg.get("row_key_col", "row_key"))

    if sample_df is not None and not sample_df.empty:
        row_key_column = str(sample_df.columns[0])
        menu_columns = list(sample_df.columns[1:])
    else:
        menu_columns = list(ids)
        for candidate in new_ids:
            if candidate not in menu_columns:
                menu_columns.append(candidate)
    normalized = [normalize_series_name(c) for c in menu_columns]

    return SubmissionContext(
        predictions_columns=list(predictions.columns),
        row_meta=row_meta,
        row_order=list(row_order),
        test_parts=test_parts,
        ids=list(ids),
        output_order=normalized,
        normalized_to_output=dict(zip(normalized, menu_columns)),
        sample_df=sample_df,
        row_key_column=row_key_column,
        date_column=date_column,
        default_fill_value=default_fill_value,
        new_ids=list(new_ids),
        missing_ids=list(missing_ids),
        missing_by_part=missing_by_part,
    )


def merge_forecasts(pred_list: List[pd.DataFrame]) -> pd.DataFrame:
    """Concatenate per-test-file forecast frames, normalising menu headers."""

    normed = []
    for df in pred_list:
        out = df.copy()
        if "row_key" in out.columns:
            out = out.set_index("row_key")
        out.columns = [normalize_series_name(c) for c in out.columns]
        normed.append(out)
    return pd.concat(normed, ignore_index=False)
