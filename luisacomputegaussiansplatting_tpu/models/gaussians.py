"""Gaussian scene containers: raw trainable parameters and activated scene.

Mirrors the reference's host-side GaussiansData SoA
(app/gaussians.h:15-35) split into two views:

  * GaussianParams — raw (pre-activation) parameters, the trainable pytree.
  * GaussianScene — activated arrays fed to the renderer: the reference
    applies sigmoid(opacity) / exp(scale) / normalize(quat) once at PLY
    load (app/gaussians.cpp:137-168); for training we keep raw params and
    activate inside the jitted step instead.

Quaternion order: PLY files store (w, x, y, z) ("rot_0..3"); everything
in-memory here is (x, y, z, w), matching the reference's `rotq.yzwx()`
swizzle at projection time (gs_projector/shader.cpp:130).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class GaussianParams(NamedTuple):
    """Raw (pre-activation) parameters; a valid jax pytree for optax."""

    means: jnp.ndarray  # (N, 3)
    log_scales: jnp.ndarray  # (N, 3)
    quats: jnp.ndarray  # (N, 4) (x, y, z, w), not necessarily unit
    opacity_logits: jnp.ndarray  # (N,)
    sh_dc: jnp.ndarray  # (N, 1, 3)
    sh_rest: jnp.ndarray  # (N, K-1, 3)

    @property
    def num_gaussians(self) -> int:
        return self.means.shape[0]

    def activate(self) -> "GaussianScene":
        from ..utils.packing import stack_cols, unstack_cols

        qx, qy, qz, qw = unstack_cols(self.quats)
        inv = jax.lax.rsqrt(qx * qx + qy * qy + qz * qz + qw * qw)
        quats = stack_cols(qx * inv, qy * inv, qz * inv, qw * inv)
        return GaussianScene(
            means=self.means,
            scales=jnp.exp(self.log_scales),
            quats=quats,
            opacities=jax.nn.sigmoid(self.opacity_logits),
            sh=jnp.concatenate([self.sh_dc, self.sh_rest], axis=1),
        )


def pad_params_to(params: "GaussianParams", capacity: int) -> "GaussianParams":
    """Zero-pad raw params to a fixed capacity for static-shape training.

    Padding rows are parked transparent (logit -15) and tiny (log-scale
    -18); models.densify tracks them as inactive and recycles them as
    clone/split children.
    """
    cur = params.means.shape[0]
    if capacity < cur:
        raise ValueError(f"capacity {capacity} < current {cur}")
    if capacity == cur:
        return params
    extra = capacity - cur

    def pad(x, fill=0.0):
        shape = (extra,) + x.shape[1:]
        return jnp.concatenate([x, jnp.full(shape, fill, x.dtype)], axis=0)

    quat_pad = jnp.zeros((extra, 4), params.quats.dtype).at[:, 3].set(1.0)
    return GaussianParams(
        means=pad(params.means),
        log_scales=pad(params.log_scales, -18.0),
        quats=jnp.concatenate([params.quats, quat_pad], axis=0),
        opacity_logits=pad(params.opacity_logits, -15.0),
        sh_dc=pad(params.sh_dc),
        sh_rest=pad(params.sh_rest),
    )


class GaussianScene(NamedTuple):
    """Activated gaussian arrays, directly consumable by ops.render."""

    means: jnp.ndarray  # (N, 3)
    scales: jnp.ndarray  # (N, 3) positive
    quats: jnp.ndarray  # (N, 4) unit (x, y, z, w)
    opacities: jnp.ndarray  # (N,) in (0, 1)
    sh: jnp.ndarray  # (N, K, 3)

    @property
    def num_gaussians(self) -> int:
        return self.means.shape[0]

    @property
    def sh_degree(self) -> int:
        return int(round(self.sh.shape[1] ** 0.5)) - 1

    def to_params(self, eps: float = 1e-12) -> GaussianParams:
        """Invert the activations (for fine-tuning a loaded scene)."""
        op = np.clip(np.asarray(self.opacities), 1e-6, 1 - 1e-6)
        return GaussianParams(
            means=self.means,
            log_scales=jnp.log(jnp.maximum(self.scales, eps)),
            quats=self.quats,
            opacity_logits=jnp.asarray(np.log(op) - np.log1p(-op)),
            sh_dc=self.sh[:, :1, :],
            sh_rest=self.sh[:, 1:, :],
        )

    def render_args(self):
        """Positional args for ops.render.render(..)."""
        return (self.means, self.scales, self.quats, self.opacities, self.sh)

    def pad_to(self, n: int) -> "GaussianScene":
        """Zero-pad to n gaussians (padding has opacity 0 => never drawn).

        Keeps shapes static across scenes for jit cache reuse and makes the
        count divisible for even sharding across a device mesh.
        """
        cur = self.num_gaussians
        if n < cur:
            raise ValueError(f"pad_to({n}) smaller than current {cur}")
        if n == cur:
            return self
        extra = n - cur

        def pad(x, fill=0.0):
            shape = (extra,) + x.shape[1:]
            return jnp.concatenate([x, jnp.full(shape, fill, x.dtype)], axis=0)

        quat_pad = jnp.zeros((extra, 4), self.quats.dtype).at[:, 3].set(1.0)
        return GaussianScene(
            means=pad(self.means),
            scales=pad(self.scales, 1e-8),
            quats=jnp.concatenate([self.quats, quat_pad], axis=0),
            opacities=pad(self.opacities),
            sh=pad(self.sh),
        )
