"""3D gaussian covariance construction and EWA screen-space projection.

Math parity (citations into /root/reference):
  * Sigma = R S S^T R^T from quaternion + scale:
    lcgs/include/lcgs/util/gaussian.hpp:15-28.
  * EWA first-order projection with focal-scaled Jacobian:
    gaussian.hpp:52-70 (the default `use_focal=true` path,
    lcgs/include/lcgs/gs_projector.h:42).
  * frustum clamp of the linearisation point t: gs_projector/shader.cpp:146-158.

EWA convention note: the reference composes `T = V3 @ J_std^T` and returns
`T^T Sigma T = J (V3^T Sigma V3) J^T`, i.e. it rotates the world covariance
by the *inverse* view rotation (gaussian.hpp:61-69 after the col-major
transposes are unfolded). The original graphdeco 3DGS CUDA rasterizer — the
validation oracle named by BASELINE.json — uses the standard
`J (V3 Sigma V3^T) J^T`. `ewa_mode="inria"` (default) implements the
standard form; `ewa_mode="lcgs"` reproduces the reference's variant for
strict parity runs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .transform import rotation_from_quaternion


def covariance_3d(scales, quats_xyzw):
    """World-space covariance Sigma = R S S^T R^T.

    Args:
      scales: (N, 3) positive scales (already exp-activated).
      quats_xyzw: (N, 4) unit quaternions in (x, y, z, w) order.

    Returns:
      (N, 3, 3) symmetric covariance matrices.
    """
    rot = rotation_from_quaternion(quats_xyzw)  # (N, 3, 3)
    m = rot * scales[..., None, :]  # R @ diag(s)
    # HIGHEST keeps f32 on TPU (default einsum precision is bf16 inputs)
    return jnp.einsum(
        "...ij,...kj->...ik", m, m, precision=jax.lax.Precision.HIGHEST
    )


def clamp_to_frustum(p_view, tan_fovx, tan_fovy, clamp_factor=1.3):
    """Clamp the EWA linearisation point into an expanded view frustum
    (parity: gs_projector/shader.cpp:146-158)."""
    z = p_view[..., 2]
    lim_x = clamp_factor * tan_fovx
    lim_y = clamp_factor * tan_fovy
    x = jnp.clip(p_view[..., 0] / z, -lim_x, lim_x) * z
    y = jnp.clip(p_view[..., 1] / z, -lim_y, lim_y) * z
    return jnp.stack([x, y, z], axis=-1)


def ewa_project_cov(cov3d, t, view3, focal_x, focal_y, ewa_mode="inria"):
    """Project world covariances to 2D pixel-space covariances.

    Args:
      cov3d: (N, 3, 3) world covariance.
      t: (N, 3) frustum-clamped view-space positions.
      view3: (3, 3) rotation block of the world->view matrix.
      focal_x, focal_y: focal lengths in pixels.
      ewa_mode: "inria" (standard EWA; graphdeco-compatible) or "lcgs"
        (reference variant, see module docstring).

    Returns:
      (N, 3) packed upper-triangular 2D covariance (a, b, c) for
      [[a, b], [b, c]], in pixel^2 units (before the low-pass filter).
    """
    hi = jax.lax.Precision.HIGHEST
    if ewa_mode == "inria":
        sigma_view = jnp.einsum("ij,njk,lk->nil", view3, cov3d, view3, precision=hi)
    elif ewa_mode == "lcgs":
        sigma_view = jnp.einsum("ji,njk,kl->nil", view3, cov3d, view3, precision=hi)
    else:
        raise ValueError(f"unknown ewa_mode: {ewa_mode!r}")

    tx, ty, tz = t[..., 0], t[..., 1], t[..., 2]
    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    # J rows: d(pix)/d(view) for the two image axes (2x3 standard Jacobian).
    j00 = focal_x * inv_z
    j02 = -focal_x * tx * inv_z2
    j11 = focal_y * inv_z
    j12 = -focal_y * ty * inv_z2

    s00 = sigma_view[..., 0, 0]
    s01 = sigma_view[..., 0, 1]
    s02 = sigma_view[..., 0, 2]
    s11 = sigma_view[..., 1, 1]
    s12 = sigma_view[..., 1, 2]
    s22 = sigma_view[..., 2, 2]

    # cov2d = J Sigma_view J^T, expanded for the sparse J.
    a = j00 * (j00 * s00 + j02 * s02) + j02 * (j00 * s02 + j02 * s22)
    b = j00 * (j11 * s01 + j12 * s02) + j02 * (j11 * s12 + j12 * s22)
    c = j11 * (j11 * s11 + j12 * s12) + j12 * (j11 * s12 + j12 * s22)
    return jnp.stack([a, b, c], axis=-1)


def conic_and_radius(cov2d, lowpass=0.3, radius_sigma=3.0, det_eps=1e-6):
    """Low-pass filter, invert to conic, and bound the splat radius.

    Parity: gs_tile_splatter/shader.cpp:139-148 (+0.3 on the diagonal,
    conic = inv(cov), radius = ceil(3 * sqrt(max eigenvalue)); the sqrt
    argument is floored at 0.1 as in the reference's max(0.1f, ...)).

    Returns:
      conic: (N, 3) packed inverse covariance (A, B, C).
      radius: (N,) int32 pixel radius (ceil), 0 only if inputs degenerate.
    """
    a = cov2d[..., 0] + lowpass
    b = cov2d[..., 1]
    c = cov2d[..., 2] + lowpass
    det = a * c - b * b
    inv_det = 1.0 / (det + det_eps)
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=-1)
    mid = 0.5 * (a + c)
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lambda_max = mid + disc
    radius = jnp.ceil(radius_sigma * jnp.sqrt(lambda_max)).astype(jnp.int32)
    return conic, radius
