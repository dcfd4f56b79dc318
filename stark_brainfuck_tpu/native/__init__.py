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

_lock = threading.Lock()
_libs = {}


def _build(src: str, so: str) -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
        "-o", so, src,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
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


def _load(name: str) -> Optional[ctypes.CDLL]:
    src = os.path.join(_DIR, f"{name}.cpp")
    so = os.path.join(_DIR, f"_{name}.so")
    with _lock:
        if name in _libs:
            return _libs[name]
        lib = None
        if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
            pass
        elif not _build(src, so):
            _libs[name] = None
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            lib = None
        _libs[name] = lib
        return lib


def get_lib() -> Optional[ctypes.CDLL]:
    """The native hashing library, or None when unavailable."""
    lib = _load("hashing")
    if lib is not None and not hasattr(lib, "_sig_done"):
        lib.blake2b_many.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_size_t, ctypes.c_char_p,
        ]
        lib.merkle_nodes.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p,
        ]
        lib.merkle_from_payloads.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_size_t, ctypes.c_char_p,
        ]
        lib._sig_done = True
    return lib


def get_vm_lib() -> Optional[ctypes.CDLL]:
    """The native Brainfuck trace recorder, or None when unavailable."""
    lib = _load("vm")
    if lib is not None and not hasattr(lib, "_sig_done"):
        lib.vm_simulate.argtypes = [
            ctypes.c_void_p, ctypes.c_size_t, ctypes.c_char_p, ctypes.c_size_t,
        ]
        lib.vm_simulate.restype = ctypes.c_int
        for fn in (
            "vm_processor_rows", "vm_instruction_rows", "vm_memory_rows",
            "vm_input_rows", "vm_output_rows",
        ):
            getattr(lib, fn).restype = ctypes.c_size_t
        lib.vm_fill.argtypes = [ctypes.c_void_p] * 5
        lib._sig_done = True
    return lib
