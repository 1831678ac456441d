"""ctypes loaders for the native host-runtime libraries.

Compiles ``window_gather.cpp`` / ``csv_pivot.cpp`` with g++ on first use
(cached per source digest in ``~/.cache/flow_timesnet_tpu``) and exposes
typed wrappers. All callers must tolerate ``None`` from
:func:`get_native_gather` / :func:`get_native_csv_pivot` and fall back to
numpy/pandas — the native paths are host-throughput optimisations, not
dependencies.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "window_gather.cpp")
_CSV_SRC = os.path.join(_HERE, "csv_pivot.cpp")


def _cache_dir() -> str:
    base = os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache"))
    path = os.path.join(base, "flow_timesnet_tpu")
    os.makedirs(path, exist_ok=True)
    return path


def _build_lib(src: str, stem: str) -> Optional[str]:
    if not os.path.exists(src):
        return None
    with open(src, "rb") as f:
        digest = hashlib.sha1(f.read()).hexdigest()[:16]
    out = os.path.join(_cache_dir(), f"lib{stem}_{digest}.so")
    if os.path.exists(out):
        return out
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-fopenmp",
        src, "-o", out,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        # retry without OpenMP (not all toolchains ship libgomp)
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", out],
                check=True, capture_output=True, timeout=120,
            )
        except (subprocess.SubprocessError, FileNotFoundError, OSError):
            return None
    return out if os.path.exists(out) else None


def _build() -> Optional[str]:
    return _build_lib(_SRC, "window_gather")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("FLOW_TIMESNET_DISABLE_NATIVE"):
            return None
        path = _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        i64p = ctypes.POINTER(ctypes.c_int64)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.gather_windows.argtypes = [
            f32p, f32p, ctypes.c_int64, ctypes.c_int64,
            i64p, i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            f32p, f32p, f32p,
        ]
        lib.gather_windows.restype = None
        lib.gather_marks.argtypes = [
            f32p, ctypes.c_int64, ctypes.c_int64, i64p,
            ctypes.c_int64, ctypes.c_int64, f32p,
        ]
        lib.gather_marks.restype = None
        lib.window_gather_abi_version.restype = ctypes.c_int
        if lib.window_gather_abi_version() != 1:
            return None
        _LIB = lib
        return _LIB


def native_available() -> bool:
    return _load() is not None


class NativeGather:
    """Typed wrappers around the compiled gather kernels."""

    def __init__(self, lib: ctypes.CDLL) -> None:
        self._lib = lib

    @staticmethod
    def _fp(arr: np.ndarray):
        return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))

    @staticmethod
    def _ip(arr: np.ndarray):
        return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))

    def gather_windows(self, X, M, starts, series, L, H):
        X = np.ascontiguousarray(X, np.float32)
        M = np.ascontiguousarray(M, np.float32)
        starts = np.ascontiguousarray(starts, np.int64)
        series = np.ascontiguousarray(series, np.int64)
        T, N = X.shape
        B = starts.shape[0]
        x = np.empty((B, L), np.float32)
        y = np.empty((B, H), np.float32)
        m = np.empty((B, H), np.float32)
        self._lib.gather_windows(
            self._fp(X), self._fp(M), T, N, self._ip(starts), self._ip(series),
            B, L, H, self._fp(x), self._fp(y), self._fp(m),
        )
        return x[..., None], y[..., None], m[..., None]

    def gather_marks(self, marks, starts, W):
        marks = np.ascontiguousarray(marks, np.float32)
        starts = np.ascontiguousarray(starts, np.int64)
        T, F = marks.shape
        B = starts.shape[0]
        out = np.empty((B, W, F), np.float32)
        self._lib.gather_marks(self._fp(marks), T, F, self._ip(starts), B, W, self._fp(out))
        return out


def get_native_gather() -> Optional[NativeGather]:
    lib = _load()
    return NativeGather(lib) if lib is not None else None


# --------------------------------------------------------------- csv pivot

_CSV_LOCK = threading.Lock()
_CSV_LIB: Optional[ctypes.CDLL] = None
_CSV_TRIED = False


def _load_csv_pivot() -> Optional[ctypes.CDLL]:
    global _CSV_LIB, _CSV_TRIED
    with _CSV_LOCK:
        if _CSV_TRIED:
            return _CSV_LIB
        _CSV_TRIED = True
        if os.environ.get("FLOW_TIMESNET_DISABLE_NATIVE"):
            return None
        path = _build_lib(_CSV_SRC, "csv_pivot")
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        i64 = ctypes.c_int64
        i64p = ctypes.POINTER(i64)
        lib.csv_pivot_parse.argtypes = [ctypes.c_char_p, i64, i64, i64]
        lib.csv_pivot_parse.restype = i64
        lib.csv_pivot_dims.argtypes = [i64, i64p, i64p, i64p]
        lib.csv_pivot_dims.restype = None
        lib.csv_pivot_fill.argtypes = [
            i64, ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_uint8), i64p, ctypes.c_char_p,
        ]
        lib.csv_pivot_fill.restype = None
        lib.csv_pivot_free.argtypes = [i64]
        lib.csv_pivot_free.restype = None
        lib.csv_pivot_abi_version.restype = ctypes.c_int
        if lib.csv_pivot_abi_version() != 2:
            return None
        _CSV_LIB = lib
        return _CSV_LIB


class NativeCsvPivot:
    """One-pass long->wide CSV pivot (see ``csv_pivot.cpp``)."""

    #: CP_E_DUPLICATE from csv_pivot.cpp — the only status the caller must
    #: distinguish: it means the data is BAD (same (date, id) twice), not
    #: that the file is merely outside the fast path's dialect.
    E_DUPLICATE = -5

    def __init__(self, lib: ctypes.CDLL) -> None:
        self._lib = lib

    def parse(self, path: str, date_idx: int, id_idx: int, target_idx: int):
        """Returns (values [T,N] f64 w/ NaN, filled [T,N] bool, days [T] i64,
        ids list[str]) or the negative status code on failure.

        Values travel as float64 end-to-end so the fast path matches the
        pandas float64 oracle bit-for-bit (ADVICE r2: f32 storage silently
        rounded 16777217 and 0.1)."""

        handle = self._lib.csv_pivot_parse(
            os.fsencode(path), date_idx, id_idx, target_idx
        )
        if handle < 0:
            return int(handle)
        try:
            T = ctypes.c_int64()
            N = ctypes.c_int64()
            id_bytes = ctypes.c_int64()
            self._lib.csv_pivot_dims(
                handle, ctypes.byref(T), ctypes.byref(N), ctypes.byref(id_bytes)
            )
            t, n = T.value, N.value
            values = np.empty((t, n), np.float64)
            filled = np.empty((t, n), np.uint8)
            days = np.empty((t,), np.int64)
            raw_ids = ctypes.create_string_buffer(max(int(id_bytes.value), 1))
            self._lib.csv_pivot_fill(
                handle,
                values.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                filled.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                days.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                raw_ids,
            )
            ids = (
                raw_ids.raw[: id_bytes.value].decode("utf-8").split("\0")[:-1]
                if n
                else []
            )
            return values, filled.astype(bool), days, ids
        finally:
            self._lib.csv_pivot_free(handle)


def get_native_csv_pivot() -> Optional[NativeCsvPivot]:
    lib = _load_csv_pivot()
    return NativeCsvPivot(lib) if lib is not None else None


def reset_native_cache_for_tests() -> None:
    """Forget loaded libraries so FLOW_TIMESNET_DISABLE_NATIVE (read at load
    time) can be toggled inside one test process."""

    global _LIB, _TRIED, _CSV_LIB, _CSV_TRIED
    with _LOCK:
        _LIB, _TRIED = None, False
    with _CSV_LOCK:
        _CSV_LIB, _CSV_TRIED = None, False
