"""ctypes bridge to the native fast-IO helper (native/fastio.cpp).

Auto-builds libfastio.so on first use when a compiler is available;
all callers fall back to NumPy when the library can't be
built/loaded, so the native path is a pure accelerator (the
reference has no native code at all, SURVEY.md 2.1 — this is the
framework's own runtime-native component for production-size I/O).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import warnings

import numpy as np

_LIBDIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native")
_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    sopath = os.path.join(_LIBDIR, "libfastio.so")
    if not os.path.exists(sopath):
        src = os.path.join(_LIBDIR, "fastio.cpp")
        if os.path.exists(src):
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", sopath, src],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception as e:  # noqa: BLE001
                warnings.warn(f"fastio build failed ({e}); using NumPy fallback")
                return None
    try:
        lib = ctypes.CDLL(sopath)
    except OSError:
        return None
    lib.parse_doubles.restype = ctypes.c_int64
    lib.parse_doubles.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64,
    ]
    lib.deinterleave.restype = None
    lib.deinterleave.argtypes = [
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
    ]
    _LIB = lib
    return _LIB


def parse_text_doubles(filename, expected: int) -> np.ndarray:
    """Parse a whitespace-separated-doubles text file (fast path)."""
    lib = _load()
    if lib is None:
        return np.loadtxt(filename, dtype=np.float64).reshape(-1)
    with open(filename, "rb") as fp:
        raw = fp.read()
    out = np.empty(expected + 1, dtype=np.float64)
    n = lib.parse_doubles(
        raw,
        len(raw),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        expected + 1,
    )
    return out[:n]


def to_complex(data: np.ndarray) -> np.ndarray:
    """Interleaved re/im -> complex array (native deinterleave)."""
    lib = _load()
    n = data.size // 2
    if lib is None:
        return data[0::2] + 1j * data[1::2]
    re = np.empty(n, dtype=np.float64)
    im = np.empty(n, dtype=np.float64)
    data = np.ascontiguousarray(data, dtype=np.float64)
    lib.deinterleave(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n,
        re.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        im.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return re + 1j * im
