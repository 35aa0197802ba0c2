"""Build-and-load helper for the C++ kernels under native/."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_LOCK = threading.Lock()
_CACHE: dict[str, ctypes.CDLL] = {}


def native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native")


def load_library(name: str) -> ctypes.CDLL:
    """Compile native/<name>.cpp (if stale) and dlopen it."""
    with _LOCK:
        if name in _CACHE:
            return _CACHE[name]
        src = os.path.join(native_dir(), f"{name}.cpp")
        if not os.path.exists(src):
            raise FileNotFoundError(src)
        build = os.path.join(native_dir(), "build")
        os.makedirs(build, exist_ok=True)
        so = os.path.join(build, f"lib{name}.so")
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src,
                 "-o", so],
                check=True, capture_output=True)
        lib = ctypes.CDLL(so)
        _CACHE[name] = lib
        return lib
