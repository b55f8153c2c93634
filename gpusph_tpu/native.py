"""ctypes bindings to the native C++ host runtime (native/src).

Builds ``libgpusph_native.so`` with g++ on first use (cached under
``native/build/``) and exposes the geometry fillers and the VTU encoder.
Callers fall back to the pure-numpy implementations when the toolchain is
unavailable (``available()`` is False).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_ROOT, "native", "src", "gpusph_native.cpp")
_BUILD_DIR = os.path.join(_ROOT, "native", "build")

_lock = threading.Lock()
_lib = None
_failed = False


def _src_hash() -> str:
    import hashlib

    with open(_SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()[:16]


def _lib_path() -> str:
    # cache keyed on a source-content hash: a fresh checkout (or an edited
    # source) never loads a stale or ISA-incompatible binary
    return os.path.join(_BUILD_DIR, f"libgpusph_native-{_src_hash()}.so")


def _build(lib_path: str) -> bool:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        "-std=c++17", _SRC, "-o", lib_path,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def _load():
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        _LIB = _lib_path()
        if not os.path.exists(_LIB):
            if not _build(_LIB):
                _failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _failed = True
            return None

        lib.fill_box.restype = ctypes.c_int64
        lib.fill_box.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_double,
            ctypes.c_void_p,
        ]
        lib.fill_sphere.restype = ctypes.c_int64
        lib.fill_sphere.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_double,
            ctypes.c_double,
            ctypes.c_void_p,
        ]
        lib.dedup_points.restype = ctypes.c_int64
        lib.dedup_points.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
            ctypes.c_double,
        ]
        lib.write_vtu.restype = ctypes.c_int32
        lib.write_vtu.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _dptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def fill_box(origin, size, dp) -> np.ndarray:
    lib = _load()
    o = np.ascontiguousarray(origin, np.float64)
    s = np.ascontiguousarray(size, np.float64)
    n = lib.fill_box(_dptr(o), _dptr(s), dp, None)
    out = np.empty((n, 3), np.float64)
    lib.fill_box(_dptr(o), _dptr(s), dp, out.ctypes.data_as(ctypes.c_void_p))
    return out


def fill_sphere(center, radius, dp) -> np.ndarray:
    lib = _load()
    c = np.ascontiguousarray(center, np.float64)
    # capacity query fills nothing when out is NULL but still counts
    n = lib.fill_sphere(_dptr(c), radius, dp, None)
    out = np.empty((n, 3), np.float64)
    lib.fill_sphere(_dptr(c), radius, dp, out.ctypes.data_as(ctypes.c_void_p))
    return out


def dedup_points(pts: np.ndarray, dp: float) -> np.ndarray:
    lib = _load()
    buf = np.ascontiguousarray(pts, np.float64).copy()
    n = lib.dedup_points(_dptr(buf), len(buf), dp)
    return buf[:n]


_VTK_TYPES = {
    np.dtype(np.float32): b"Float32",
    np.dtype(np.float64): b"Float64",
    np.dtype(np.int32): b"Int32",
    np.dtype(np.uint32): b"UInt32",
    np.dtype(np.uint8): b"UInt8",
}


def write_vtu(path: str, pos: np.ndarray, fields: dict) -> bool:
    """Native single-pass VTU write. Returns False if unavailable."""
    lib = _load()
    if lib is None:
        return False
    pos = np.ascontiguousarray(pos, np.float32)
    n = len(pos)
    names, types, datas, sizes, ncomps, keep = [], [], [], [], [], []
    for name, a in fields.items():
        a = np.ascontiguousarray(a)
        if a.dtype not in _VTK_TYPES:
            a = a.astype(np.float32)
        keep.append(a)
        names.append(name.encode())
        types.append(_VTK_TYPES[a.dtype])
        datas.append(a.ctypes.data_as(ctypes.c_void_p))
        sizes.append(a.nbytes)
        ncomps.append(1 if a.ndim == 1 else a.shape[1])
    nf = len(names)
    rc = lib.write_vtu(
        path.encode(),
        n,
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nf,
        (ctypes.c_char_p * nf)(*names),
        (ctypes.c_char_p * nf)(*types),
        (ctypes.c_void_p * nf)(*[d for d in datas]),
        (ctypes.c_int64 * nf)(*sizes),
        (ctypes.c_int32 * nf)(*ncomps),
    )
    return rc == 0


__all__ = ["available", "fill_box", "fill_sphere", "dedup_points", "write_vtu"]
