"""ctypes bindings for the native runtime library (native/libvegs_native.so).

Native host-side components (the TPU analog of the reference's CUDA helpers,
SURVEY.md §2.3): multithreaded binary-PLY column ingestion for the
multi-hundred-MB KITTI-360 clouds, and the simple-knn distCUDA2 equivalent
(mean squared distance to the 3 nearest neighbors) as a uniform spatial grid.

Every entry point degrades gracefully to the pure-Python implementation when
the library has not been built (`make -C native`).
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

_LIB_PATHS = (
    Path(__file__).resolve().parent.parent / "native" / "libvegs_native.so",
)
_lib = None
_checked = False


def _load():
    global _lib, _checked
    if _checked:
        return _lib
    _checked = True
    for p in _LIB_PATHS:
        if p.exists():
            try:
                lib = ctypes.CDLL(str(p))
                lib.vegs_knn_mean_sq_dist.restype = ctypes.c_int
                lib.vegs_knn_mean_sq_dist.argtypes = [
                    ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                    ctypes.c_int, ctypes.POINTER(ctypes.c_float),
                ]
                lib.vegs_read_ply_columns.restype = ctypes.c_int64
                lib.vegs_read_ply_columns.argtypes = [
                    ctypes.c_char_p, ctypes.c_char_p,
                    ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ]
                _lib = lib
                break
            except OSError:
                pass
    return _lib


def available() -> bool:
    return _load() is not None


def build(quiet: bool = True) -> bool:
    """Compile the library in-tree (g++)."""
    import subprocess

    native_dir = Path(__file__).resolve().parent.parent / "native"
    r = subprocess.run(["make", "-C", str(native_dir)],
                       capture_output=quiet)
    global _checked
    _checked = False
    return r.returncode == 0 and available()


def knn_mean_sq_dist(points: np.ndarray, k: int = 3) -> Optional[np.ndarray]:
    """distCUDA2 equivalent; None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    out = np.empty(len(pts), np.float32)
    rc = lib.vegs_knn_mean_sq_dist(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(pts), k,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out if rc == 0 else None


def read_ply_columns(path, names: Sequence[str],
                     n_hint: Optional[int] = None) -> Optional[np.ndarray]:
    """Read named vertex properties from a binary-little-endian PLY as a
    [len(names), n] float32 array; None on any unsupported layout."""
    lib = _load()
    if lib is None:
        return None
    if n_hint is None:
        # header-only pass in Python to size the buffer
        with open(path, "rb") as f:
            n_hint = 0
            for raw in f:
                line = raw.decode("ascii", "replace")
                if line.startswith("element vertex"):
                    n_hint = int(line.split()[2])
                if line.startswith("end_header"):
                    break
    out = np.empty((len(names), n_hint), np.float32)
    n = lib.vegs_read_ply_columns(
        str(path).encode(), ";".join(names).encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.size)
    if n < 0:
        return None
    return out[:, :n]
