"""Native (C++) host-side accelerators, loaded via ctypes.

Built lazily with g++ on first use; every entry point has a bit-identical
Python fallback, so the framework works without a compiler. ``get_lib()``
returns None when the native library is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "native.cpp")
_SO = os.path.join(_HERE, "_librecombiner_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
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
        lib.rctb_crc32.restype = ctypes.c_uint32
        lib.rctb_crc32.argtypes = [ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint32]
        lib.pack_indices_u16.restype = ctypes.c_int
        lib.pack_indices_u16.argtypes = [
            ctypes.c_void_p, ctypes.c_uint64, ctypes.c_int, ctypes.c_void_p,
        ]
        lib.unpack_indices_u16.restype = None
        lib.unpack_indices_u16.argtypes = [ctypes.c_void_p, ctypes.c_uint64, ctypes.c_void_p]
        lib.parse_pdb_ca.restype = ctypes.c_int64
        lib.parse_pdb_ca.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64, ctypes.c_int64, ctypes.c_void_p,
        ]
        lib.gumbel_chain.restype = None
        lib.gumbel_chain.argtypes = [ctypes.c_uint32, ctypes.c_int64, ctypes.c_void_p]
        lib.patch_permutations.restype = None
        lib.patch_permutations.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
        ]
        _lib = lib
        return _lib


# ------------------------------------------------------------ wrappers


def crc32(data: bytes, crc: int = 0) -> Optional[int]:
    lib = get_lib()
    if lib is None:
        return None
    buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    return int(lib.rctb_crc32(buf, len(data), crc))


def pack_indices(idx: np.ndarray, bits: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    idx = np.ascontiguousarray(idx, np.int32)
    out = np.empty(idx.size, np.uint16)
    rc = lib.pack_indices_u16(
        idx.ctypes.data, idx.size, bits, out.ctypes.data_as(ctypes.c_void_p)
    )
    if rc != 0:
        raise ValueError(f"index out of range for {bits}-bit groups")
    return out.reshape(idx.shape)


def parse_pdb_ca(text: bytes, max_len: int = 96) -> Optional[tuple]:
    """Returns (count, coords (max_len,3) float32) or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.zeros((max_len, 3), np.float32)
    n = lib.parse_pdb_ca(text, len(text), max_len, out.ctypes.data_as(ctypes.c_void_p))
    if n < 0:
        return None  # malformed floats: fall back to python
    return int(n), out


def patch_permutations(n_rows: int, n_cols: int) -> Optional[tuple]:
    """(perm, inv) each (n_rows, n_cols) int32: column c is the numpy stream
    RandomState(c).choice(n_rows, n_rows, False); inv its inverse. None if
    the native library is unavailable (caller falls back to numpy)."""
    lib = get_lib()
    if lib is None:
        return None
    perm = np.empty((n_rows, n_cols), np.int32)
    inv = np.empty((n_rows, n_cols), np.int32)
    lib.patch_permutations(
        n_rows, n_cols,
        perm.ctypes.data_as(ctypes.c_void_p), inv.ctypes.data_as(ctypes.c_void_p),
    )
    return perm, inv


def gumbel_chain(n: int, seed: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty(n, np.float64)
    lib.gumbel_chain(seed, n, out.ctypes.data_as(ctypes.c_void_p))
    return out
