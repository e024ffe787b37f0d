"""Native (C++) fast paths, compiled on demand with g++ and loaded via ctypes.

Currently: the FMD run-length codec (rld_codec.cpp).  Every entry point has a
pure-Python fallback in formats/, so a missing toolchain only costs speed.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "rld_codec.cpp")
_SO = os.path.join(_DIR, "_rld_codec.so")

_lib = None
_tried = False


def get_lib():
    """Return the loaded ctypes library, building it if needed; None if
    unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", _SO + ".tmp", _SRC],
                check=True,
                capture_output=True,
            )
            os.replace(_SO + ".tmp", _SO)
        lib = ctypes.CDLL(_SO)
        lib.rb3t_fmd_decode.restype = ctypes.c_int64
        lib.rb3t_fmd_decode.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int64,
        ]
        lib.rb3t_fmd_encode.restype = ctypes.c_void_p
        lib.rb3t_fmd_encode.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64)]
        lib.rb3t_free.argtypes = [ctypes.c_void_p]
        lib.rb3t_runs_expand.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
        lib.rb3t_block_counts.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p]
        _lib = lib
    except Exception:
        _lib = None
    return _lib
