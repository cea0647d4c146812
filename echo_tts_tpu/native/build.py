"""Build/load the native library (g++ -O3 -shared)."""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "resample.cc")
_SO = os.path.join(_DIR, "libecho_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def build(force: bool = False) -> str:
    """Compile resample.cc -> libecho_native.so. Idempotent."""
    with _lock:
        if not force and os.path.exists(_SO) and (
                os.path.getmtime(_SO) >= os.path.getmtime(_SRC)):
            return _SO
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
               "-o", _SO, _SRC]
        subprocess.run(cmd, check=True, capture_output=True)
        return _SO


def load(auto_build: bool = True) -> Optional[ctypes.CDLL]:
    """Load (building if needed). Returns None when unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    try:
        if not os.path.exists(_SO):
            if not auto_build:
                return None
            build()
        lib = ctypes.CDLL(_SO)
        lib.upfirdn_f32.restype = ctypes.c_int
        lib.upfirdn_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ]
        lib.mono_mix_normalize_f32.restype = ctypes.c_int
        lib.mono_mix_normalize_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
        return _lib
    except Exception:
        return None


if __name__ == "__main__":
    print(build(force=True))
