"""ctypes loader for the native window-gather library.

Compiles ``window_gather.cpp`` with g++ on first use (cached per source
mtime in ``~/.cache/flow_timesnet_tpu``) and exposes typed wrappers. All
callers must tolerate ``None`` from :func:`get_native_gather` and fall back
to numpy — the native path is a host-throughput optimisation, not a
dependency.
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

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "window_gather.cpp")


def _cache_dir() -> str:
    base = os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache"))
    path = os.path.join(base, "flow_timesnet_tpu")
    os.makedirs(path, exist_ok=True)
    return path


def _build() -> Optional[str]:
    if not os.path.exists(_SRC):
        return None
    with open(_SRC, "rb") as f:
        digest = hashlib.sha1(f.read()).hexdigest()[:16]
    out = os.path.join(_cache_dir(), f"libwindow_gather_{digest}.so")
    if os.path.exists(out):
        return out
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-fopenmp",
        _SRC, "-o", out,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        # retry without OpenMP (not all toolchains ship libgomp)
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", out],
                check=True, capture_output=True, timeout=120,
            )
        except (subprocess.SubprocessError, FileNotFoundError, OSError):
            return None
    return out if os.path.exists(out) else None


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
