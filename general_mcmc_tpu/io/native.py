"""ctypes bridge to the native C++ export kernel (csrc/fastio.cpp).

Builds lazily with g++ when the shared object is missing (pybind11 is not
available in the build image; the C ABI + ctypes keeps the binding
dependency-free).  Falls back cleanly: callers use
:func:`native_write_csv_available` and drop to the pyarrow path otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_REPO_ROOT = os.path.dirname(os.path.dirname(_PKG_DIR))
_SRC = os.path.join(_REPO_ROOT, "csrc", "fastio.cpp")
# Wheel installs ship the .so inside the package (setup.py BuildNativeIO);
# source checkouts may have a legacy csrc/ build; otherwise build lazily
# into the package dir.
_SO = os.path.join(_PKG_DIR, "libgmtio.so")
_SO_LEGACY = os.path.join(_REPO_ROOT, "csrc", "libgmtio.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _find_or_build():
    for so in (_SO, _SO_LEGACY):
        if os.path.exists(so) and not (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(so)
        ):
            return so
    subprocess.run(
        [
            os.environ.get("CXX", "g++"),
            "-O3", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _SO,
        ],
        check=True,
        capture_output=True,
        timeout=120,
    )
    return _SO


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            lib = ctypes.CDLL(_find_or_build())
            lib.gmt_write_csv.argtypes = [
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_uint32,
                ctypes.c_uint32,
                ctypes.c_uint32,
                ctypes.c_char_p,
            ]
            lib.gmt_write_csv.restype = ctypes.c_int
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def native_write_csv_available() -> bool:
    return _load() is not None


def native_write_csv(data, filename: str) -> None:
    """Write [chains, obs, dims] as CSV via the C++ kernel."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native IO kernel unavailable")
    arr = np.ascontiguousarray(np.asarray(data), dtype=np.float64)
    c, o, d = arr.shape
    rc = lib.gmt_write_csv(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        c,
        o,
        d,
        filename.encode(),
    )
    if rc != 0:
        raise IOError(f"native CSV writer failed with code {rc}")
