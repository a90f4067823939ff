"""Image output utilities.

Reproduces the reference app's image post-processing
(app/main.cpp:322-340): CHW float -> HWC uint8 with a vertical flip,
written as PNG (PIL here instead of the reference's stb_image_write).
"""

from __future__ import annotations

import numpy as np


def chw_to_png_array(img_chw, flip_vertical: bool = True) -> np.ndarray:
    """(3, H, W) float in [0, 1] -> (H, W, 3) uint8, optionally flipped
    like the reference (main.cpp:331 writes row h-1-i)."""
    img = np.asarray(img_chw)
    img = np.clip(img, 0.0, 1.0)
    hwc = np.transpose(img, (1, 2, 0))
    if flip_vertical:
        hwc = hwc[::-1]
    # the reference truncates (float * 255 -> u8 cast), not rounds
    return (hwc * 255.0).astype(np.uint8)


def write_png(path, img_chw, flip_vertical: bool = True, use_native: bool = True) -> None:
    """Write a (3, H, W) float image as PNG.

    Fast path: the dependency-free C++ writer (native/png_writer.cpp,
    the counterpart of the reference's stb_image_write); falls back to
    PIL when the shared library is unavailable.
    """
    arr = chw_to_png_array(img_chw, flip_vertical)
    if use_native:
        from ..io.native import write_png_native

        if write_png_native(path, arr):
            return
    from PIL import Image

    Image.fromarray(arr, mode="RGB").save(path)


def read_png(path) -> np.ndarray:
    """PNG -> (3, H, W) float32 in [0, 1] (no flip)."""
    from PIL import Image

    arr = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
    return np.transpose(arr, (2, 0, 1))
