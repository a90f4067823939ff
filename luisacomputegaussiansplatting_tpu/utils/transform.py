"""Coordinate/rotation math shared by host-side camera setup and the
device-side projection ops.

Conventions follow the reference renderer so outputs are comparable:
  * NDC<->pixel mapping per lcgs/include/lcgs/util/transform.hpp:13-23.
  * quaternion (x, y, z, w) -> rotation matrix per transform.hpp:188-212
    (the reference builds it column-major; here we return the standard
    row-major matrix, i.e. R @ v rotates v).

Everything is written against jax.numpy but accepts plain numpy arrays.
"""

from __future__ import annotations

import jax.numpy as jnp


def ndc2pix(v, resolution):
    """Map NDC in [-1, 1] to continuous pixel coordinates.

    Pixel centres sit at integer coordinates: -1 -> -0.5, +1 -> res - 0.5.
    Parity: lcgs/src/module.cpp:18-20.
    """
    return ((v + 1.0) * resolution - 1.0) * 0.5


def pix2ndc(pix, resolution):
    """Inverse of :func:`ndc2pix` up to the half-pixel convention
    (reference transform.hpp:19-23)."""
    return 2.0 * pix / resolution - 1.0


def normalize(v, axis=-1, eps=0.0):
    n = jnp.linalg.norm(v, axis=axis, keepdims=True)
    return v / (n + eps)


def rotation_from_quaternion(q):
    """Rotation matrices from unit quaternions.

    Args:
      q: (..., 4) quaternions ordered (x, y, z, w). Callers loading 3DGS PLY
        data must convert from the stored (w, x, y, z) order first
        (reference gs_projector/shader.cpp:130 does `rotq.yzwx()`).

    Returns:
      (..., 3, 3) rotation matrices acting on column vectors (R @ v).
    """
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - z * w)
    r02 = 2 * (x * z + y * w)
    r10 = 2 * (x * y + z * w)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - x * w)
    r20 = 2 * (x * z - y * w)
    r21 = 2 * (y * z + x * w)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def quaternion_multiply(q1, q2):
    """Hamilton product of (x, y, z, w) quaternions
    (parity: reference transform.hpp:162-181)."""
    x1, y1, z1, w1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    x2, y2, z2, w2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def rotate_axis_angle(aa, p, eps=1e-12):
    """Rodrigues rotation of points by an axis-angle vector.

    ``aa`` is the compact encoding: rotation axis = aa / |aa|, angle =
    |aa| radians (parity: reference transform.hpp:100-124 ``rotate_aa``).
    Zero vectors rotate by identity (the reference's normalize would NaN).

    Args:
      aa: (..., 3) axis-angle vectors. p: (..., 3) points.
    """
    aa = jnp.asarray(aa, jnp.float32)
    p = jnp.asarray(p, jnp.float32)
    angle = jnp.linalg.norm(aa, axis=-1, keepdims=True)
    axis = aa / jnp.maximum(angle, eps)
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    return (
        p * c
        + jnp.cross(axis, p) * s
        + axis * jnp.sum(axis * p, axis=-1, keepdims=True) * (1.0 - c)
    )


def rotation_from_axis_angle(aa, eps=1e-12):
    """(..., 3, 3) row-major rotation matrices (R @ v) from axis-angle
    vectors with angle = |aa| (parity: reference transform.hpp:126-160
    ``R_from_aa``, which stores the same matrix column-major)."""
    aa = jnp.asarray(aa, jnp.float32)
    angle = jnp.linalg.norm(aa, axis=-1)
    axis = aa / jnp.maximum(angle[..., None], eps)
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    c1 = 1.0 - c
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    return jnp.stack(
        [
            jnp.stack([c1 * x * x + c, c1 * x * y - z * s, c1 * x * z + y * s], axis=-1),
            jnp.stack([c1 * x * y + z * s, c1 * y * y + c, c1 * y * z - x * s], axis=-1),
            jnp.stack([c1 * x * z - y * s, c1 * y * z + x * s, c1 * z * z + c], axis=-1),
        ],
        axis=-2,
    )


def quaternion_from_axis_angle(axis, angle):
    """(x, y, z, w) quaternion from a unit axis and an angle in radians
    (parity: reference transform.hpp:85-97)."""
    axis = jnp.asarray(axis)
    angle = jnp.asarray(angle)
    s = jnp.sin(angle * 0.5)[..., None]
    return jnp.concatenate(
        [axis * s, jnp.cos(angle * 0.5)[..., None]], axis=-1
    )
