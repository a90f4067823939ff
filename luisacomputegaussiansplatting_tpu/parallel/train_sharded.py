"""Multi-chip 3DGS training step: view data-parallelism x gaussian/tile
sharding on a 2D mesh ("data", "gs").

Layout:
  * GaussianParams / optimizer state: sharded over "gs" (each gs-group of
    chips owns P/n_gs gaussians), replicated over "data".
  * Camera batch + target images: sharded over "data" (views) and over
    "gs" (image tile-row bands, matching render_sharded's output layout).
  * Forward/backward: render via the all-to-all exchange over "gs";
    photometric loss psum'd over both axes; parameter gradients psum'd
    over "data" only (over "gs" each shard's grads are already local —
    the transposed all-to-all routed them home).

This is the TPU-native analog of the reference's missing distributed
layer (SURVEY.md section 2: "Parallelism inventory: NONE in reference").
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ..config import TILE, RenderConfig
from ..models.gaussians import GaussianParams
from ..models.losses import l1_loss
from ..models.trainer import TrainConfig, TrainState, make_optimizer
from ..ops.projection import tile_grid
from ..utils.camera import CameraView
from .render_sharded import ShardedRenderConfig, _render_shard

try:
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map


def make_sharded_train_step(
    mesh: Mesh,
    width: int,
    height: int,
    cfg: RenderConfig = RenderConfig(),
    scfg: ShardedRenderConfig = ShardedRenderConfig(),
    sh_degree: int = 3,
    tc: TrainConfig = TrainConfig(),
    bg_color=(0.0, 0.0, 0.0),
    data_axis: str = "data",
    gs_axis: str = "gs",
):
    """Build (step_fn, opt, shardings) for the 2D-mesh training step.

    step_fn(state, cam_views, targets) -> (state, loss):
      cam_views: CameraView pytree with a leading view-batch axis V
        (V divisible by mesh.shape[data_axis]).
      targets: (V, 3, H_pad, W_pad) with H_pad = band-aligned height
        (pad_targets below) and W_pad = tile-aligned width.
    """
    n_data = mesh.shape[data_axis]
    n_gs = mesh.shape[gs_axis]
    grid_x, grid_y = tile_grid(width, height)
    rows_per_dev = -(-grid_y // n_gs)
    tiles_per_dev = rows_per_dev * grid_x
    band_h = rows_per_dev * TILE
    w_pad = grid_x * TILE
    opt = make_optimizer(tc)
    bg = jnp.asarray(bg_color, jnp.float32)

    def local_step(params, opt_state, step_no, cam_views, targets):
        """Per-device body. params: gaussian shard; cam_views: V_loc local
        views; targets: (V_loc, 3, band_h, w_pad) local image bands."""
        dev_gs = jax.lax.axis_index(gs_axis)
        v_loc = targets.shape[0]

        def loss_fn(p: GaussianParams):
            scene = p.activate()

            def one_view(cam_view, target_band):
                band, _aux = _render_shard(
                    scene.means,
                    scene.scales,
                    scene.quats,
                    scene.opacities,
                    scene.sh,
                    cam_view,
                    bg,
                    ndev=n_gs,
                    p_shard=p.means.shape[0],
                    grid_x=grid_x,
                    tiles_per_dev=tiles_per_dev,
                    width=width,
                    height=height,
                    sh_degree=sh_degree,
                    cfg=cfg,
                    scfg=scfg,
                    axis=gs_axis,
                )
                # mask out rows past the true image height in this band
                row0 = dev_gs * band_h
                rows = row0 + jnp.arange(band_h)
                mask = (rows < height).astype(jnp.float32)[None, :, None]
                diff = jnp.abs(band - target_band) * mask
                return jnp.sum(diff)

            total = jnp.float32(0.0)
            for v in range(v_loc):  # static, small per-device view count
                cam_v = jax.tree.map(lambda x: x[v], cam_views)
                total = total + one_view(cam_v, targets[v])
            # mean over all pixels and views across the whole mesh
            denom = 3.0 * height * width * v_loc * n_data
            loss = jax.lax.psum(total, (data_axis, gs_axis)) / denom
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        # params are replicated over the data axis -> psum their grads;
        # over gs each shard's grads are already complete and local
        grads = jax.lax.pmean(grads, data_axis)
        updates, new_opt = opt.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt, step_no + 1, loss.reshape(1)

    spec_gs = P(gs_axis)

    def _leaf_spec(x):
        # optimizer-state scalars (e.g. Adam step counts) stay replicated
        return spec_gs if getattr(x, "ndim", 0) >= 1 else P()

    _cache = {}

    def step_fn(state: TrainState, cam_views: CameraView, targets):
        key = jax.tree.structure(state.opt_state)
        if key not in _cache:
            opt_specs = jax.tree.map(_leaf_spec, state.opt_state)
            fn = shard_map(
                local_step,
                mesh=mesh,
                in_specs=(
                    spec_gs,
                    opt_specs,
                    P(),
                    P(data_axis),
                    P(data_axis, None, gs_axis, None),
                ),
                out_specs=(spec_gs, opt_specs, P(), P()),
                check_vma=False,
            )
            _cache[key] = jax.jit(fn)
        new_params, new_opt, new_step, loss = _cache[key](
            state.params, state.opt_state, state.step, cam_views, targets
        )
        return TrainState(new_params, new_opt, new_step), loss.reshape(())[()]

    def pad_targets(targets):
        """(V, 3, H, W) -> band/tile aligned (V, 3, band_h*n_gs, w_pad)."""
        v = targets.shape[0]
        h_pad = band_h * n_gs
        out = jnp.zeros((v, 3, h_pad, w_pad), jnp.float32)
        return out.at[:, :, :height, :width].set(targets)

    return step_fn, opt, pad_targets
