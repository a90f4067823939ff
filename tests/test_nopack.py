"""pack_mode="none": raw sorted ranges with masked aligned over-reads
must reproduce the packed pipeline exactly — forward AND backward,
including saturated tiles (boundary-chunk read-modify-write)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from luisacomputegaussiansplatting_tpu.config import RenderConfig
from luisacomputegaussiansplatting_tpu.io.synthetic import random_scene
from luisacomputegaussiansplatting_tpu.ops.render import render
from luisacomputegaussiansplatting_tpu.utils.camera import look_at_camera

CAM = look_at_camera(
    (3.0, -2.5, 2.0), (0, 0, 0), (0, 0, 1), fov=70.0, width=96, height=64
)


def _scenes():
    yield "sparse", random_scene(400, seed=13, extent=2.0, scale_range=(0.02, 0.08))
    # dense + opaque: saturating tiles exercise the early-exit/zero-fill
    dense = random_scene(500, seed=14, extent=0.4, scale_range=(0.15, 0.3))
    yield "dense", dense._replace(
        opacities=np.full((500,), 0.85, np.float32)
    )


@pytest.mark.parametrize("name,scene", list(_scenes()))
def test_forward_matches_packed(name, scene):
    packed = RenderConfig(max_pairs=60_000, pack_mode="chunk")
    nopack = RenderConfig(max_pairs=60_000, pack_mode="none")
    a = jax.jit(lambda *x: render(*x, CAM, cfg=packed))(*scene.render_args())
    b = jax.jit(lambda *x: render(*x, CAM, cfg=nopack))(*scene.render_args())
    # the two modes group the log-transmittance prefix into different
    # chunks; at saturating pixels a last-ulp difference can flip an
    # entry across the T < 1e-4 stop, so dense scenes get a small band
    atol = 1e-6 if name == "sparse" else 5e-4
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol)


@pytest.mark.parametrize("name,scene", list(_scenes()))
def test_backward_matches_packed(name, scene):
    wimg = jnp.asarray(
        np.random.default_rng(1).normal(size=(3, CAM.height, CAM.width)),
        jnp.float32,
    )

    def loss(cfg):
        return lambda *a: jnp.sum(render(*a, CAM, cfg=cfg) * wimg)

    gp = jax.jit(jax.grad(
        loss(RenderConfig(max_pairs=60_000, pack_mode="chunk")),
        argnums=(0, 1, 2, 3, 4),
    ))(*scene.render_args())
    gn = jax.jit(jax.grad(
        loss(RenderConfig(max_pairs=60_000, pack_mode="none")),
        argnums=(0, 1, 2, 3, 4),
    ))(*scene.render_args())
    # chunk boundaries differ between the modes, so the backward MXU
    # moment sums regroup differently; ~2e-4 relative is fp noise
    atol = 3e-5 if name == "sparse" else 2e-3
    for a, b in zip(gp, gn):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(b).all()
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(a / scale, b / scale, atol=atol)
