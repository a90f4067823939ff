"""ctypes binding for the native C++ PLY loader (native/ply_loader.cpp).

Builds on demand with `make -C native` (or build_native()); load_ply falls
back to the pure-numpy reader when the shared library is unavailable or
the file uses a schema the native fast path doesn't handle.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libgsply.so")
_lib = None
_lib_failed = False


def build_native(quiet: bool = True) -> bool:
    """Compile native/libgsply.so; returns True on success."""
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=quiet,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    if not os.path.exists(_LIB_PATH) and not build_native():
        _lib_failed = True
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _lib_failed = True
        return None
    lib.gsply_info.restype = ctypes.c_int
    lib.gsply_info.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_int),
    ]
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.gsply_load.restype = ctypes.c_int
    lib.gsply_load.argtypes = [
        ctypes.c_char_p,
        f32p,
        f32p,
        f32p,
        f32p,
        f32p,
        ctypes.c_int,
        ctypes.c_int,
    ]
    _lib = lib
    return _lib


def load_gsply_native(path: str, apply_activations: bool = True, n_threads: int = 0):
    """Load a binary 3DGS PLY via the native loader.

    Returns (means, sh, opacity, scales, quats_xyzw) numpy arrays, or None
    if the native path is unavailable / the file is unsupported.
    """
    lib = _get_lib()
    if lib is None:
        return None
    n = ctypes.c_long()
    k_rest = ctypes.c_int()
    rc = lib.gsply_info(path.encode(), ctypes.byref(n), ctypes.byref(k_rest))
    if rc != 0:
        return None
    n = n.value
    k_sh = 1 + k_rest.value // 3
    means = np.empty((n, 3), np.float32)
    sh = np.empty((n, k_sh, 3), np.float32)
    opacity = np.empty((n,), np.float32)
    scales = np.empty((n, 3), np.float32)
    quats = np.empty((n, 4), np.float32)
    rc = lib.gsply_load(
        path.encode(),
        means,
        sh.reshape(-1),
        opacity,
        scales,
        quats,
        1 if apply_activations else 0,
        n_threads,
    )
    if rc != 0:
        return None
    return means, sh, opacity, scales, quats
