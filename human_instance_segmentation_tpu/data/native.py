"""ctypes loader for the native mask codecs (_native/rle.cpp).

Compiles the shared object on first use (g++ -O3) and exposes numpy-typed
wrappers; every entry point has a pure-Python fallback in coco.py, so the
pipeline works even without a toolchain.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

_HERE = Path(__file__).parent
_SRC = _HERE / "_native" / "rle.cpp"
_LIB_PATH = _HERE / "_native" / "librle.so"
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", str(_SRC), "-o", str(_LIB_PATH)],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, building it on first use; None if
    unavailable (callers fall back to numpy)."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            _load_failed = True
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        lib.rle_decode.argtypes = [i32p, ctypes.c_int, u8p, ctypes.c_int, ctypes.c_int]
        lib.rle_encode.argtypes = [u8p, ctypes.c_int, ctypes.c_int, i32p, ctypes.c_int]
        lib.rle_encode.restype = ctypes.c_int
        lib.leb_decode.argtypes = [u8p, ctypes.c_int, i32p, ctypes.c_int]
        lib.leb_decode.restype = ctypes.c_int
        lib.leb_encode.argtypes = [i32p, ctypes.c_int, u8p, ctypes.c_int]
        lib.leb_encode.restype = ctypes.c_int
        lib.rasterize_polygons.argtypes = [f64p, i32p, ctypes.c_int, u8p,
                                           ctypes.c_int, ctypes.c_int]
        _lib = lib
    except Exception:
        _load_failed = True
    return _lib


def rle_decode_native(counts: Sequence[int], h: int, w: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    c = np.ascontiguousarray(counts, np.int32)
    out = np.zeros((h, w), np.uint8)
    lib.rle_decode(c, len(c), out, h, w)
    return out


def rle_encode_native(mask: np.ndarray) -> Optional[List[int]]:
    lib = get_lib()
    if lib is None:
        return None
    m = np.ascontiguousarray(mask, np.uint8)
    h, w = m.shape
    out = np.zeros(h * w + 2, np.int32)
    n = lib.rle_encode(m, h, w, out, len(out))
    if n < 0:
        return None
    return out[:n].tolist()


def leb_decode_native(s: bytes) -> Optional[List[int]]:
    lib = get_lib()
    if lib is None:
        return None
    buf = np.frombuffer(s, np.uint8)
    out = np.zeros(max(len(s), 4), np.int32)
    n = lib.leb_decode(np.ascontiguousarray(buf), len(buf), out, len(out))
    if n < 0:
        return None
    return out[:n].tolist()


def leb_encode_native(counts: Sequence[int]) -> Optional[str]:
    lib = get_lib()
    if lib is None:
        return None
    c = np.ascontiguousarray(counts, np.int32)
    out = np.zeros(len(c) * 8 + 16, np.uint8)
    n = lib.leb_encode(c, len(c), out, len(out))
    if n < 0:
        return None
    return out[:n].tobytes().decode("ascii")


def rasterize_polygons_native(polygons: Sequence[Sequence[float]], h: int, w: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    flat = []
    sizes = []
    for poly in polygons:
        npts = len(poly) // 2
        sizes.append(npts)
        flat.extend(poly[: 2 * npts])
    if not sizes:
        return np.zeros((h, w), np.uint8)
    xy = np.ascontiguousarray(flat, np.float64)
    ps = np.ascontiguousarray(sizes, np.int32)
    out = np.zeros((h, w), np.uint8)
    lib.rasterize_polygons(xy, ps, len(sizes), out, h, w)
    return out
