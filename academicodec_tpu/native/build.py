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


_WAV_SRC = os.path.join(os.path.dirname(__file__), "wavloader.cpp")
_WAV_SO = os.path.join(os.path.dirname(__file__), "_wavloader.so")
_WAV_LIB: Optional[ctypes.CDLL] = None
_WAV_TRIED = False


def get_wavloader_lib() -> Optional[ctypes.CDLL]:
    """Native threaded wav-crop batch loader; None if no toolchain
    (callers fall back to the Python pipeline)."""
    global _WAV_LIB, _WAV_TRIED
    with _LOCK:
        if _WAV_LIB is not None or _WAV_TRIED:
            return _WAV_LIB
        _WAV_TRIED = True
        try:
            if not (
                os.path.exists(_WAV_SO)
                and os.path.getmtime(_WAV_SO) >= os.path.getmtime(_WAV_SRC)
            ):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", _WAV_SO, _WAV_SRC,
                     "-lpthread"],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_WAV_SO)
            lib.wavloader_create.restype = ctypes.c_void_p
            lib.wavloader_create.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_longlong,
                ctypes.c_uint, ctypes.c_float, ctypes.c_int, ctypes.c_ulonglong,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_longlong,
            ]
            lib.wavloader_next.restype = ctypes.c_longlong
            lib.wavloader_next.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)
            ]
            lib.wavloader_batches_per_epoch.restype = ctypes.c_longlong
            lib.wavloader_batches_per_epoch.argtypes = [ctypes.c_void_p]
            lib.wavloader_fallbacks.restype = ctypes.c_longlong
            lib.wavloader_fallbacks.argtypes = [ctypes.c_void_p]
            lib.wavloader_destroy.restype = None
            lib.wavloader_destroy.argtypes = [ctypes.c_void_p]
            _WAV_LIB = lib
        except Exception:
            _WAV_LIB = None
        return _WAV_LIB
