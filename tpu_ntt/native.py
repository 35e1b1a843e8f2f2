"""ctypes bridge to the native C++ oracle (native/oracle.cpp).

Builds liboracle.so on demand with g++ (cached next to the source) and
falls back gracefully when no compiler is available — callers check
``available()`` or rely on the pure-Python reference instead.

Used by the test suite for large-n independent verification and by the
benchmark --check path.  q must be < 2^62.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "native", "oracle.cpp")
_SO = os.path.join(os.path.dirname(_SRC), "liboracle.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-std=c++20", "-O2", "-fPIC", "-shared", "-o", _SO, _SRC],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    u64p = ctypes.POINTER(ctypes.c_uint64)
    u64 = ctypes.c_uint64
    for name, extra in (("nwc_schoolbook", 0), ("nwc_fast", 1),
                        ("cyclic_schoolbook", 0)):
        fn = getattr(lib, name)
        fn.restype = None
        fn.argtypes = [u64p, u64p, u64p, u64, u64] + [u64] * extra
    lib.dft_direct.restype = None
    lib.dft_direct.argtypes = [u64p, u64p, u64, u64, u64]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _as_u64(x: Sequence[int]) -> np.ndarray:
    return np.ascontiguousarray(
        np.array([int(v) for v in x], dtype=np.uint64)
    )


def _call2(name: str, a, b, q: int, *extra: int) -> list[int]:
    lib = _load()
    if lib is None:
        raise RuntimeError("native oracle unavailable (no g++?)")
    aa, bb = _as_u64(a), _as_u64(b)
    n = len(aa)
    out = np.zeros(n, dtype=np.uint64)
    p = ctypes.POINTER(ctypes.c_uint64)
    getattr(lib, name)(
        aa.ctypes.data_as(p), bb.ctypes.data_as(p), out.ctypes.data_as(p),
        n, q, *extra,
    )
    return [int(v) for v in out]


def nwc_schoolbook(a, b, q: int) -> list[int]:
    """O(n^2) negacyclic convolution (x^n = -1) over exact 128-bit products."""
    return _call2("nwc_schoolbook", a, b, q)


def cyclic_schoolbook(a, b, q: int) -> list[int]:
    """O(n^2) cyclic convolution (x^n = 1)."""
    return _call2("cyclic_schoolbook", a, b, q)


def nwc_fast(a, b, q: int, psi: int) -> list[int]:
    """Independent O(n log n) negacyclic product (iterative DIT NTT)."""
    return _call2("nwc_fast", a, b, q, psi)


def dft_direct(x, q: int, omega: int) -> list[int]:
    """Direct O(n^2) DFT mod q — butterfly-free transform oracle."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native oracle unavailable (no g++?)")
    xx = _as_u64(x)
    n = len(xx)
    out = np.zeros(n, dtype=np.uint64)
    p = ctypes.POINTER(ctypes.c_uint64)
    lib.dft_direct(xx.ctypes.data_as(p), out.ctypes.data_as(p), n, q, omega)
    return [int(v) for v in out]
