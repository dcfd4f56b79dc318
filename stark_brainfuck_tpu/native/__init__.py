"""Native (C++) runtime components, bridged via ctypes.

Build is lazy: the shared object compiles on first use with g++ -O3
-fopenmp and is cached beside the source. Every consumer has a pure-python
fallback, so the framework works without a toolchain (just slower)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "hashing.cpp")
_SO = os.path.join(_DIR, "_hashing.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
        "-o", _SO, _SRC,
    ]
    try:
        subprocess.run(
            cmd, check=True, capture_output=True, timeout=120
        )
        return True
    except Exception:
        try:  # retry without -march=native (portability)
            subprocess.run(
                [c for c in cmd if c != "-march=native"],
                check=True, capture_output=True, timeout=120,
            )
            return True
        except Exception:
            return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The native hashing library, or None when unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
            _SRC
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.blake2b_many.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_size_t, ctypes.c_char_p,
        ]
        lib.merkle_nodes.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p,
        ]
        lib.merkle_from_payloads.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_size_t, ctypes.c_char_p,
        ]
        _lib = lib
        return _lib
