"""Sliding-window sampling over wide [T, N] arrays.

TPU-native replacement for the reference's per-item torch Dataset/DataLoader
(``/root/reference/src/timesnet_forecast/data/dataset.py``): samples are
enumerated as (window, series) pairs with the exact reference semantics —
``len = windows_per_series * N``, ``window = idx // N``, ``series = idx % N``,
one series per sample (channel dim 1) — but batches are assembled with
vectorised numpy gathers and shipped to the device as whole arrays, so the
hot path is a single H2D transfer per step instead of per-item collation.

Fixed batch shapes: evaluation iterators pad the final partial batch and mark
padded rows invalid via a ``row_valid`` flag so a single compiled program
serves every step.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Iterator, List, Optional, Sequence

import numpy as np
import pandas as pd

from .time_features import build_time_features
from ..runtime.native import get_native_gather


@dataclass
class WindowBatch:
    """One device-ready batch of per-series windows."""

    x: np.ndarray  # [B, L, 1]
    y: np.ndarray  # [B, H, 1]
    mask: np.ndarray  # [B, H, 1]
    x_mark: Optional[np.ndarray]  # [B, L, F] or None
    y_mark: Optional[np.ndarray]  # [B, H, F] or None
    static: Optional[np.ndarray]  # [B, 1, Fs] or None
    series_ids: Optional[np.ndarray]  # [B, 1] int32 or None
    row_valid: np.ndarray  # [B] float32, 0 for padded rows


class SlidingWindowSource:
    """Window index bookkeeping for one contiguous wide array."""

    def __init__(
        self,
        wide_values: np.ndarray,  # [T, N]
        input_len: int,
        pred_len: int,
        mode: str,
        recursive_pred_len: int | None = None,
        augment: Dict[str, Any] | None = None,
        stride: int = 1,
        valid_mask: np.ndarray | None = None,
        series_static: np.ndarray | None = None,
        series_ids: Sequence[int] | np.ndarray | None = None,
        time_index: pd.DatetimeIndex | np.ndarray | None = None,
        time_features: np.ndarray | None = None,
        time_feature_config: Dict[str, Any] | None = None,
    ) -> None:
        assert mode in ("direct", "recursive")
        self.X = np.asarray(wide_values, dtype=np.float32)
        if self.X.ndim != 2 or self.X.shape[1] <= 0:
            raise ValueError("wide_values must be a [T, N] array with N >= 1")
        if valid_mask is not None and np.asarray(valid_mask).shape != self.X.shape:
            raise ValueError("valid_mask must match wide_values shape")
        self.M = (
            np.ones_like(self.X, dtype=np.float32)
            if valid_mask is None
            else np.asarray(valid_mask, dtype=np.float32)
        )
        self.T, self.N = self.X.shape
        self.L = int(input_len)
        if mode == "direct":
            self.H = int(pred_len)
        else:
            self.H = int(recursive_pred_len if recursive_pred_len is not None else 1)
        self.mode = mode
        augment = augment or {}
        self.add_noise_std = float(augment.get("add_noise_std", 0.0))
        self.time_shift = int(augment.get("time_shift", 0))
        max_start = self.T - self.L - self.H
        step = max(1, int(stride))
        self.stride = step
        self.starts = (
            np.zeros(0, dtype=np.int64)
            if max_start < 0
            else np.arange(0, max_start + 1, step, dtype=np.int64)
        )

        self.time_feature_config = dict(time_feature_config or {})
        idx = _coerce_index(time_index, self.T)
        self.marks: Optional[np.ndarray] = None
        if time_features is not None:
            feats = np.asarray(time_features, dtype=np.float32)
            if feats.ndim == 1:
                feats = feats.reshape(-1, 1)
            if feats.ndim != 2 or feats.shape[0] != self.T:
                raise ValueError("time_features must be a [T, F] array aligned with wide_values")
            if feats.shape[1] > 0:
                self.marks = feats
        elif idx is not None and self.time_feature_config.get("enabled", False):
            feats = build_time_features(idx, self.time_feature_config)
            if feats.shape[0] != self.T:
                raise ValueError("Computed time features must align with wide_values")
            if feats.shape[1] > 0:
                self.marks = feats.astype(np.float32)
        elif self.time_feature_config.get("enabled", False):
            raise ValueError(
                "time features enabled but no time_index or precomputed time_features provided"
            )
        self.time_feature_dim = 0 if self.marks is None else int(self.marks.shape[1])
        self.time_frequency = idx.freqstr if idx is not None else None

        if series_static is not None:
            static = np.asarray(series_static, dtype=np.float32)
            if static.ndim == 1:
                static = static.reshape(-1, 1)
            if static.shape[0] != self.N:
                raise ValueError("series_static must have shape [num_series, num_features]")
            self.static = static
        else:
            self.static = None
        if series_ids is not None:
            ids_arr = np.asarray(series_ids)
            if ids_arr.ndim != 1 or ids_arr.shape[0] != self.N:
                raise ValueError("series_ids must be a 1D sequence of length num_series")
            self.series_ids = ids_arr.astype(np.int32)
        else:
            self.series_ids = None

    @property
    def windows_per_series(self) -> int:
        return int(len(self.starts))

    def __len__(self) -> int:
        return self.windows_per_series * self.N

    def gather(self, sample_idx: np.ndarray, rng: Optional[np.random.Generator]) -> WindowBatch:
        """Assemble a batch from flat sample indices (vectorised)."""

        if self.windows_per_series <= 0:
            raise IndexError("SlidingWindowSource is empty")
        window_idx = sample_idx // self.N
        series_idx = (sample_idx % self.N).astype(np.int64)
        starts = self.starts[window_idx]
        if self.time_shift > 0 and rng is not None:
            delta = rng.integers(-self.time_shift, self.time_shift + 1, size=starts.shape)
            starts = np.clip(starts + delta, 0, self.T - self.L - self.H)
        native = get_native_gather()
        if native is not None:
            x, y, mask = native.gather_windows(
                self.X, self.M, starts, series_idx, self.L, self.H
            )
            if self.marks is not None:
                x_mark = native.gather_marks(self.marks, starts, self.L)
                y_mark = native.gather_marks(self.marks, starts + self.L, self.H)
            else:
                x_mark = y_mark = None
        else:
            t_in = starts[:, None] + np.arange(self.L)[None, :]
            t_out = (starts + self.L)[:, None] + np.arange(self.H)[None, :]
            x = self.X[t_in, series_idx[:, None]][..., None].astype(np.float32)
            y = self.X[t_out, series_idx[:, None]][..., None].astype(np.float32)
            mask = self.M[t_out, series_idx[:, None]][..., None].astype(np.float32)
            x_mark = self.marks[t_in] if self.marks is not None else None
            y_mark = self.marks[t_out] if self.marks is not None else None
        if self.add_noise_std > 0 and rng is not None:
            x = x + rng.standard_normal(x.shape).astype(np.float32) * self.add_noise_std
        static = self.static[series_idx][:, None, :] if self.static is not None else None
        ids = (
            self.series_ids[series_idx][:, None]
            if self.series_ids is not None
            else None
        )
        return WindowBatch(
            x=x,
            y=y,
            mask=mask,
            x_mark=x_mark,
            y_mark=y_mark,
            static=static,
            series_ids=ids,
            row_valid=np.ones(len(sample_idx), dtype=np.float32),
        )


def _coerce_index(
    index: Optional[pd.DatetimeIndex | np.ndarray], expected_len: int
) -> Optional[pd.DatetimeIndex]:
    if index is None:
        return None
    idx = index if isinstance(index, pd.DatetimeIndex) else pd.to_datetime(np.asarray(index))
    if len(idx) != expected_len:
        raise ValueError("time_index length must match the first dimension of wide_values")
    return idx


class WindowBatcher:
    """Batch iterator over the concatenation of several window sources."""

    def __init__(
        self,
        sources: List[SlidingWindowSource],
        batch_size: int,
        shuffle: bool,
        drop_last: bool,
        seed: int = 0,
        pad_final: bool = False,
    ) -> None:
        self.sources = [s for s in sources if len(s) > 0]
        self.batch_size = int(batch_size)
        self.shuffle = bool(shuffle)
        self.drop_last = bool(drop_last)
        self.pad_final = bool(pad_final)
        self._seed = int(seed)
        self._rng = np.random.default_rng(seed)
        sizes = [len(s) for s in self.sources]
        self._offsets = np.cumsum([0] + sizes)
        self.total = int(self._offsets[-1]) if sizes else 0

    def __len__(self) -> int:
        if self.total == 0:
            return 0
        if self.drop_last:
            return self.total // self.batch_size
        return (self.total + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int) -> None:
        """Reseed shuffling/augmentation as a pure function of (seed, epoch).

        Makes the batch order independent of how many epochs were already
        iterated — required for exact mid-training resume.
        """

        self._rng = np.random.default_rng([self._seed, int(epoch)])

    @property
    def time_feature_dim(self) -> int:
        for s in self.sources:
            if s.time_feature_dim:
                return s.time_feature_dim
        return 0

    @property
    def time_frequency(self) -> Optional[str]:
        for s in self.sources:
            if s.time_frequency:
                return str(s.time_frequency)
        return None

    def _gather_global(self, idx: np.ndarray, rng: Optional[np.random.Generator]) -> WindowBatch:
        pieces: List[WindowBatch] = []
        order = np.argsort(idx, kind="stable")
        sorted_idx = idx[order]
        source_of = np.searchsorted(self._offsets, sorted_idx, side="right") - 1
        for s_id in np.unique(source_of):
            local = sorted_idx[source_of == s_id] - self._offsets[s_id]
            pieces.append(self.sources[s_id].gather(local, rng))
        batch = _concat_batches(pieces)
        # restore requested order
        inv = np.empty_like(order)
        inv[order] = np.arange(len(order))
        return _take_batch(batch, inv)

    def __iter__(self) -> Iterator[WindowBatch]:
        if self.total == 0:
            return
        order = np.arange(self.total)
        rng = self._rng if self.shuffle else None
        if self.shuffle:
            self._rng.shuffle(order)
        n_full = self.total // self.batch_size
        for b in range(n_full):
            idx = order[b * self.batch_size : (b + 1) * self.batch_size]
            yield self._gather_global(idx, rng)
        rem = self.total - n_full * self.batch_size
        if rem > 0 and not self.drop_last:
            idx = order[n_full * self.batch_size :]
            batch = self._gather_global(idx, rng)
            if self.pad_final and rem < self.batch_size:
                batch = pad_batch_rows(batch, self.batch_size)
            yield batch


class Prefetcher:
    """Background-thread batch prefetch over any batch iterable.

    The TPU-native stand-in for the reference DataLoader's worker/prefetch
    stack (``num_workers``/``prefetch_factor``/``pin_memory``,
    /root/reference/src/timesnet_forecast/train.py:218-227): one daemon
    thread assembles the next ``depth`` host batches (numpy gather + concat)
    while the device runs the current step. Used by the host input pipeline
    — the fallback when the device-resident path is unavailable (gradient
    accumulation, or staged arrays above ``train.device_stage_mb``); the
    resident path needs no host prefetch at all.

    Exceptions raised inside the producer re-raise at the consuming site.
    """

    _END = object()

    def __init__(self, iterable, depth: int = 2) -> None:
        import queue
        import threading

        self._queue_mod = queue
        self._q: "queue.Queue" = queue.Queue(maxsize=max(1, int(depth)))
        self._err: Optional[BaseException] = None
        self._stopped = False

        def _run() -> None:
            try:
                for item in iterable:
                    if self._stopped:
                        break
                    self._q.put(item)
                    if self._stopped:
                        break
            except BaseException as e:  # noqa: BLE001 — re-raised on the consumer
                self._err = e
            finally:
                while True:
                    if self._stopped:
                        break  # close() owns shutdown; consumer is gone
                    try:
                        self._q.put(self._END, timeout=0.1)
                        break
                    except queue.Full:
                        continue

        self._thread = threading.Thread(
            target=_run, name="flow-timesnet-prefetch", daemon=True
        )
        self._thread.start()

    def __iter__(self) -> "Prefetcher":
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._END:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item

    def close(self) -> None:
        """Release the producer if the consumer abandons iteration early.

        Sets the stop flag and drains the queue so a blocked ``put`` wakes
        up, sees the flag, and exits — otherwise an abandoned epoch (step
        exception, early interrupt) would leave the daemon thread pinned on
        ``q.put`` holding ``depth`` batches for the process lifetime.
        """

        self._stopped = True
        try:
            while True:
                self._q.get_nowait()
        except self._queue_mod.Empty:
            pass
        self._thread.join(timeout=5.0)
        try:  # the released producer may have deposited one final item
            while True:
                self._q.get_nowait()
        except self._queue_mod.Empty:
            pass
        try:  # a late next() should see StopIteration, not block
            self._q.put_nowait(self._END)
        except self._queue_mod.Full:
            pass


def _concat_batches(pieces: List[WindowBatch]) -> WindowBatch:
    if len(pieces) == 1:
        return pieces[0]

    def cat(field: str):
        vals = [getattr(p, field) for p in pieces]
        if any(v is None for v in vals):
            return None
        return np.concatenate(vals, axis=0)

    return WindowBatch(
        x=cat("x"),
        y=cat("y"),
        mask=cat("mask"),
        x_mark=cat("x_mark"),
        y_mark=cat("y_mark"),
        static=cat("static"),
        series_ids=cat("series_ids"),
        row_valid=cat("row_valid"),
    )


def _take_batch(batch: WindowBatch, idx: np.ndarray) -> WindowBatch:
    def take(v):
        return None if v is None else v[idx]

    return WindowBatch(
        x=batch.x[idx],
        y=batch.y[idx],
        mask=batch.mask[idx],
        x_mark=take(batch.x_mark),
        y_mark=take(batch.y_mark),
        static=take(batch.static),
        series_ids=take(batch.series_ids),
        row_valid=batch.row_valid[idx],
    )


def pad_batch_rows(batch: WindowBatch, target: int) -> WindowBatch:
    """Pad a batch to ``target`` rows with zero-filled, row_valid=0 rows."""

    cur = batch.x.shape[0]
    if cur >= target:
        return batch
    pad = target - cur

    def pad_arr(v):
        if v is None:
            return None
        widths = [(0, pad)] + [(0, 0)] * (v.ndim - 1)
        return np.pad(v, widths)

    out = WindowBatch(
        x=pad_arr(batch.x),
        y=pad_arr(batch.y),
        mask=pad_arr(batch.mask),
        x_mark=pad_arr(batch.x_mark),
        y_mark=pad_arr(batch.y_mark),
        static=pad_arr(batch.static),
        series_ids=pad_arr(batch.series_ids),
        row_valid=np.concatenate([batch.row_valid, np.zeros(pad, dtype=np.float32)]),
    )
    return out


def build_batcher(
    arrays: List[np.ndarray],
    masks: List[Optional[np.ndarray]],
    input_len: int,
    pred_len: int,
    stride: int,
    mode: str,
    batch_size: int,
    shuffle: bool,
    drop_last: bool,
    recursive_pred_len: int | None = None,
    augment: Dict[str, Any] | None = None,
    series_static: List[Optional[np.ndarray]] | None = None,
    series_ids: List[Optional[np.ndarray]] | None = None,
    time_indices: List[Optional[pd.DatetimeIndex]] | None = None,
    time_features: List[Optional[np.ndarray]] | None = None,
    time_feature_config: Dict[str, Any] | None = None,
    seed: int = 0,
    pad_final: bool = False,
) -> WindowBatcher:
    """Assemble a :class:`WindowBatcher` over per-fold arrays.

    Mirrors the reference ``_build_dataloader`` assembly (``train.py:164-227``)
    without worker processes: the numpy gather path feeds the device directly.
    """

    if len(arrays) != len(masks):
        raise ValueError("arrays and masks must have the same length")
    for name, aux in (
        ("series_static", series_static),
        ("series_ids", series_ids),
        ("time_indices", time_indices),
        ("time_features", time_features),
    ):
        if aux is not None and len(aux) != len(arrays):
            raise ValueError(f"{name} must match arrays length when provided")
    sources = [
        SlidingWindowSource(
            arr,
            input_len,
            pred_len,
            mode,
            recursive_pred_len,
            augment,
            stride=stride,
            valid_mask=msk,
            series_static=series_static[i] if series_static is not None else None,
            series_ids=series_ids[i] if series_ids is not None else None,
            time_index=time_indices[i] if time_indices is not None else None,
            time_features=time_features[i] if time_features is not None else None,
            time_feature_config=time_feature_config,
        )
        for i, (arr, msk) in enumerate(zip(arrays, masks))
    ]
    return WindowBatcher(
        sources,
        batch_size=batch_size,
        shuffle=shuffle,
        drop_last=drop_last,
        seed=seed,
        pad_final=pad_final,
    )
