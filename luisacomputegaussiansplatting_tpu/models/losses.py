"""Training losses for 3DGS fitting.

The reference renderer has no training at all (SURVEY.md section 3.5);
these follow the canonical graphdeco 3DGS recipe: (1-l)*L1 + l*(1-SSIM)
with l = 0.2 and an 11x11 sigma=1.5 gaussian SSIM window.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


@functools.lru_cache(maxsize=None)
def _ssim_window(size: int = 11, sigma: float = 1.5):
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    g /= g.sum()
    return g.astype(np.float32)


def _blur(img, window):
    """Separable depthwise gaussian blur of (C, H, W)."""
    c = img.shape[0]
    size = window.shape[0]
    w = jnp.asarray(window)
    kh = jnp.broadcast_to(w.reshape(1, 1, size, 1), (c, 1, size, 1))
    kw = jnp.broadcast_to(w.reshape(1, 1, 1, size), (c, 1, 1, size))
    x = img[None]  # (1, C, H, W)
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NCHW", "OIHW", "NCHW"))
    pad_h = [(size // 2, size // 2), (0, 0)]
    pad_w = [(0, 0), (size // 2, size // 2)]
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), pad_h, dimension_numbers=dn, feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )
    x = jax.lax.conv_general_dilated(
        x, kw, (1, 1), pad_w, dimension_numbers=dn, feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )
    return x[0]


def ssim_map(img0, img1, c1: float = 0.01**2, c2: float = 0.03**2):
    """Per-pixel SSIM map of a (C, H, W) image pair in [0, 1].

    Exposed separately so the sharded loss (parallel/train_sharded.py)
    can compute the map on a halo-extended band and crop it, which
    matches the single-chip map exactly.
    """
    window = _ssim_window()
    c = img0.shape[0]
    # ONE stacked depthwise blur (2 separable convs over 5C channels)
    # instead of five (10 convs): grouped convolution is per-channel, so
    # this is numerically identical and removes ~5x conv launches from
    # the training hot path (the loss runs per view per step)
    stacked = jnp.concatenate(
        [img0, img1, img0 * img0, img1 * img1, img0 * img1], axis=0
    )
    b = _blur(stacked, window)
    mu0, mu1 = b[:c], b[c : 2 * c]
    mu00 = mu0 * mu0
    mu11 = mu1 * mu1
    mu01 = mu0 * mu1
    s00 = b[2 * c : 3 * c] - mu00
    s11 = b[3 * c : 4 * c] - mu11
    s01 = b[4 * c :] - mu01
    num = (2 * mu01 + c1) * (2 * s01 + c2)
    den = (mu00 + mu11 + c1) * (s00 + s11 + c2)
    return num / den


def ssim(img0, img1, c1: float = 0.01**2, c2: float = 0.03**2):
    """Mean SSIM over a (C, H, W) image pair in [0, 1]."""
    return jnp.mean(ssim_map(img0, img1, c1, c2))


def d_ssim_l1_loss(pred, target, ssim_weight: float = 0.2):
    """(1-w)*L1 + w*(1 - SSIM): the standard 3DGS photometric loss."""
    return (1.0 - ssim_weight) * l1_loss(pred, target) + ssim_weight * (
        1.0 - ssim(pred, target)
    )


def psnr(pred, target):
    mse = jnp.mean((pred - target) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
