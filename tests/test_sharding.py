"""Multi-chip sharding on a virtual 8-device CPU mesh: the gaussian+tile
sharded render must reproduce the single-device render, and gradients
must flow back through the all-to-all exchange identically."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from luisacomputegaussiansplatting_tpu.config import RenderConfig
from luisacomputegaussiansplatting_tpu.io.synthetic import random_scene
from luisacomputegaussiansplatting_tpu.models.trainer import (
    TrainState,
    init_train_state,
)
from luisacomputegaussiansplatting_tpu.ops.render import render
from luisacomputegaussiansplatting_tpu.parallel.mesh import make_mesh
from luisacomputegaussiansplatting_tpu.parallel.render_sharded import (
    ShardedRenderConfig,
    render_sharded,
)
from luisacomputegaussiansplatting_tpu.parallel.train_sharded import (
    make_sharded_train_step,
)
from luisacomputegaussiansplatting_tpu.utils.camera import look_at_camera

CAM = look_at_camera((3.0, -2.5, 2.0), (0, 0, 0), (0, 0, 1),
                     fov=70.0, width=64, height=64)
CFG = RenderConfig(max_pairs=20_000)
SCFG = ShardedRenderConfig(max_pairs_local=8192, exchange_capacity=2048)


@pytest.fixture(scope="module")
def scene():
    return random_scene(96, seed=21)  # 96 divides by 8


def test_devices():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"


def test_sharded_render_matches_single(scene):
    mesh = make_mesh((8,), ("gs",))
    # bg is a traced argument: one compile covers both colour cases
    f_s = jax.jit(
        lambda bg, *a: render_sharded(
            *a, CAM, mesh, cfg=CFG, scfg=SCFG, bg_color=bg
        )
    )
    f_1 = jax.jit(
        lambda bg, *a: render(*a, CAM, bg_color=bg, cfg=CFG)
    )
    for bg in ((0.0, 0.0, 0.0), (0.2, 0.4, 0.6)):
        bg = jnp.asarray(bg, jnp.float32)
        img_s, aux = f_s(bg, *scene.render_args())
        assert not bool(aux.overflow)
        img_1 = f_1(bg, *scene.render_args())
        np.testing.assert_allclose(
            np.asarray(img_s), np.asarray(img_1), atol=2e-5
        )


def test_sharded_grads_match_single(scene):
    mesh = make_mesh((8,), ("gs",))
    rng = np.random.default_rng(0)
    wimg = jnp.asarray(
        rng.normal(size=(3, CAM.height, CAM.width)), jnp.float32
    )

    def loss_sharded(*args):
        img, _ = render_sharded(*args, CAM, mesh, cfg=CFG, scfg=SCFG)
        return jnp.sum(img * wimg)

    def loss_single(*args):
        return jnp.sum(render(*args, CAM, cfg=CFG) * wimg)

    g_s = jax.jit(jax.grad(loss_sharded, argnums=(0, 1, 2, 3, 4)))(
        *scene.render_args()
    )
    g_1 = jax.jit(jax.grad(loss_single, argnums=(0, 1, 2, 3, 4)))(
        *scene.render_args()
    )
    for name, a, b in zip("msqoh", g_s, g_1):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-8
        np.testing.assert_allclose(a / scale, b / scale, atol=3e-4, err_msg=name)


def test_uneven_band_split(scene):
    """Height whose tile rows don't divide the device count."""
    cam = CAM.resized(64, 48)  # 3 tile rows over 8 devices
    mesh = make_mesh((8,), ("gs",))
    img_s, aux = jax.jit(
        lambda *a: render_sharded(*a, cam, mesh, cfg=CFG, scfg=SCFG)
    )(*scene.render_args())
    img_1 = jax.jit(lambda *a: render(*a, cam, cfg=CFG))(*scene.render_args())
    assert img_s.shape == (3, 48, 64)
    np.testing.assert_allclose(np.asarray(img_s), np.asarray(img_1), atol=2e-5)


def test_sharded_train_step_runs(scene):
    mesh = make_mesh((2, 4), ("data", "gs"))
    step_fn, opt, pad_targets = make_sharded_train_step(
        mesh, CAM.width, CAM.height, cfg=CFG, scfg=SCFG
    )
    params = scene.to_params()
    # start away from the optimum (targets are renders of `scene` itself)
    rng = np.random.default_rng(3)
    params = params._replace(
        means=params.means + jnp.asarray(
            rng.normal(0, 0.03, params.means.shape), jnp.float32
        ),
        opacity_logits=params.opacity_logits - 0.5,
    )
    state, _ = init_train_state(params)

    # 2 views (one per data shard)
    cams = [
        look_at_camera((3.0, -2.5, 2.0), (0, 0, 0), (0, 0, 1),
                       fov=70.0, width=64, height=64),
        look_at_camera((-2.5, 3.0, 1.5), (0, 0, 0), (0, 0, 1),
                       fov=70.0, width=64, height=64),
    ]
    views = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[c.to_view() for c in cams]
    )
    targets = jnp.stack(
        [render(*scene.render_args(), c, cfg=CFG) for c in cams]
    )
    targets = pad_targets(targets)

    state2, loss = step_fn(state, views, targets)
    assert np.isfinite(float(loss))
    # params actually moved
    delta = np.abs(
        np.asarray(state2.params.means) - np.asarray(state.params.means)
    ).max()
    assert delta > 0

    # loss decreases over a few steps on a fixed target
    losses = [float(loss)]
    for _ in range(6):
        state2, loss = step_fn(state2, views, targets)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
