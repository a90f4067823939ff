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


# ---------------------------------------------------------------------------
# native PNG writer (native/png_writer.cpp) — stb_image_write parity
# ---------------------------------------------------------------------------

_PNG_LIB_PATH = os.path.join(_NATIVE_DIR, "libgspng.so")
_png_lib = None
_png_failed = False


def _get_png_lib():
    global _png_lib, _png_failed
    if _png_lib is not None or _png_failed:
        return _png_lib
    if not os.path.exists(_PNG_LIB_PATH) and not build_native():
        _png_failed = True
        return None
    try:
        lib = ctypes.CDLL(_PNG_LIB_PATH)
        lib.write_png_rgb8.restype = ctypes.c_int
        lib.write_png_rgb8.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
        ]
        _png_lib = lib
    except OSError:
        _png_failed = True
    return _png_lib


def write_png_native(path: str, hwc_u8: np.ndarray) -> bool:
    """Write an (H, W, 3) uint8 array as PNG via the C++ writer.

    Returns False (caller should fall back to PIL) if the library is
    unavailable or the write fails.
    """
    lib = _get_png_lib()
    if lib is None:
        return False
    arr = np.ascontiguousarray(hwc_u8, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        return False
    h, w = arr.shape[:2]
    rc = lib.write_png_rgb8(
        os.fspath(path).encode(),
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        int(w),
        int(h),
    )
    return rc == 0
