"""Real spherical-harmonics evaluation for view-dependent colour.

Constants and band polynomials match the canonical 3DGS formulation
(reference lcgs/include/lcgs/util/sh.hpp:12-138); the degree<=3 colour is

    c(dir) = clamp( sum_bands + 0.5, 0, 1 )

per reference lcgs/src/sh_preprocessor.cpp:150-153. Unlike the reference
(which only ships dL/dsh stubs with the dL/d_dir terms left TODO,
sh.hpp:64,116,164), this implementation is a plain jnp function, so JAX
autodiff yields the *complete* backward including direction gradients.
"""

from __future__ import annotations

import jax.numpy as jnp

SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
SH_C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)


def num_sh_coeffs(degree: int) -> int:
    return (degree + 1) * (degree + 1)


def sh_basis(dirs, degree: int):
    """SH basis values Y_lm(dir) for l <= degree.

    Args:
      dirs: (..., 3) unit view directions.
      degree: 0..3.

    Returns:
      (..., (degree+1)^2) basis, ordered like the 3DGS coefficient layout.
    """
    if not 0 <= degree <= 3:
        raise ValueError(f"SH degree must be in [0, 3], got {degree}")
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    one = jnp.ones_like(x)
    basis = [SH_C0 * one]
    if degree >= 1:
        basis += [-SH_C1 * y, SH_C1 * z, -SH_C1 * x]
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, zx = x * y, y * z, z * x
        basis += [
            SH_C2[0] * xy,
            SH_C2[1] * yz,
            SH_C2[2] * (2.0 * zz - xx - yy),
            SH_C2[3] * zx,
            SH_C2[4] * (xx - yy),
        ]
    if degree >= 3:
        basis += [
            SH_C3[0] * y * (3.0 * xx - yy),
            SH_C3[1] * xy * z,
            SH_C3[2] * y * (4.0 * zz - xx - yy),
            SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            SH_C3[4] * x * (4.0 * zz - xx - yy),
            SH_C3[5] * z * (xx - yy),
            SH_C3[6] * x * (xx - 3.0 * yy),
        ]
    return jnp.stack(basis, axis=-1)


def sh_basis_comps(x, y, z, degree: int):
    """SH basis values as a list of (N,) arrays (no stacking) — see
    :func:`sh_basis` for the stacked variant and ordering."""
    if not 0 <= degree <= 3:
        raise ValueError(f"SH degree must be in [0, 3], got {degree}")
    one = jnp.ones_like(x)
    basis = [SH_C0 * one]
    if degree >= 1:
        basis += [-SH_C1 * y, SH_C1 * z, -SH_C1 * x]
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, zx = x * y, y * z, z * x
        basis += [
            SH_C2[0] * xy,
            SH_C2[1] * yz,
            SH_C2[2] * (2.0 * zz - xx - yy),
            SH_C2[3] * zx,
            SH_C2[4] * (xx - yy),
        ]
    if degree >= 3:
        basis += [
            SH_C3[0] * y * (3.0 * xx - yy),
            SH_C3[1] * xy * z,
            SH_C3[2] * y * (4.0 * zz - xx - yy),
            SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            SH_C3[4] * x * (4.0 * zz - xx - yy),
            SH_C3[5] * z * (xx - yy),
            SH_C3[6] * x * (xx - 3.0 * yy),
        ]
    return basis


def eval_sh_color(sh_coeffs, dirs, degree: int):
    """Evaluate SH colour: clamp(sum_k Y_k(dir) * sh_k + 0.5, 0, 1).

    Component-wise over (N,) vectors — one fused VPU pass under XLA and
    no f32[N, 1] cotangent buffers (utils/packing.py explains the layout
    trap this avoids).

    Args:
      sh_coeffs: (N, K, 3) with K >= (degree+1)^2 (3DGS layout: band 0
        first, then the l=1..3 coefficients in m order).
      dirs: (N, 3) unit directions (gaussian_pos - camera_pos, normalised).
      degree: active SH degree, 0..3.

    Returns:
      (N, 3) RGB in [0, 1].
    """
    from .packing import stack_cols, unstack_cols

    n, k_tot = sh_coeffs.shape[0], sh_coeffs.shape[1]
    k = num_sh_coeffs(degree)
    x, y, z = unstack_cols(dirs)
    basis = sh_basis_comps(x, y, z, degree)
    sh_flat = unstack_cols(sh_coeffs.reshape(n, k_tot * 3))  # 3K x (N,)
    chans = []
    for c in range(3):
        acc = 0.5
        for i in range(k):
            acc = acc + basis[i] * sh_flat[i * 3 + c]
        chans.append(jnp.clip(acc, 0.0, 1.0))
    return stack_cols(*chans)


def sh_from_color(color):
    """DC-only inverse: the band-0 coefficient reproducing a constant colour
    (parity: reference sh.hpp:167-173)."""
    return (jnp.asarray(color) - 0.5) / SH_C0
