"""Lazy ctypes build/loader for the native bitstream library."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "bitpack.cpp")
_SO = os.path.join(os.path.dirname(__file__), "_bitpack.so")


def _build() -> bool:
    try:
        if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
            return True
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
            check=True,
            capture_output=True,
        )
        return True
    except Exception:
        return False


def get_bitpack_lib() -> Optional[ctypes.CDLL]:
    """Return the loaded native library, building on first use; None if no
    toolchain is available (callers fall back to pure Python)."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
            lib.bitpack.restype = ctypes.c_int64
            lib.bitpack.argtypes = [
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64,
                ctypes.c_int32,
                ctypes.POINTER(ctypes.c_uint8),
            ]
            lib.bitunpack.restype = ctypes.c_int64
            lib.bitunpack.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64,
                ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64,
            ]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB
