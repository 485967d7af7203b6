"""ctypes bindings for the native trajectory scanner (native/trajscan.cpp).

Builds the shared library on first use (cached next to the source); falls
back cleanly if no compiler is available — callers treat a None handle as
"use the pure-Python path".
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtrajscan.so")

_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    src = os.path.join(_NATIVE_DIR, "trajscan.cpp")
    try:
        if (not os.path.exists(_LIB_PATH)
                or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)):
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", src, "-o", _LIB_PATH],
                check=True, capture_output=True, timeout=120,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.trajscan_scan.restype = ctypes.c_long
        lib.trajscan_scan.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_long),
        ]
        _lib = lib
    except (OSError, subprocess.SubprocessError, FileNotFoundError):
        _lib = None
    return _lib


def scan_frames(path: str) -> Optional[Tuple[np.ndarray, np.ndarray, int]]:
    """(offsets, times, header_bytes) of the trajectory, or None if the
    native scanner is unavailable or the file is malformed."""
    lib = _load()
    if lib is None:
        return None
    capacity = 1024
    while True:
        offsets = np.zeros(capacity, np.int64)
        times = np.zeros(capacity, np.float64)
        header = ctypes.c_long(0)
        n = lib.trajscan_scan(
            path.encode(), offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
            times.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            capacity, ctypes.byref(header))
        if n < 0:
            return None
        if n <= capacity:
            return offsets[:n], times[:n], int(header.value)
        capacity = int(n) + 16
