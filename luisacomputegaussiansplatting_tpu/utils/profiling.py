"""Profiling utilities.

The reference's only instrumentation is a wall clock around the frame
loop (app/main.cpp:225,317-320) and an ImGui FPS counter. Here:

  * ``trace(logdir)`` — jax.profiler device trace (TensorBoard/Perfetto).
  * ``stage_timings(...)`` — per-stage wall times of the render pipeline,
    each stage jitted and timed in isolation (the tool behind the numbers
    in BASELINE.md).
  * ``Timer`` — reps/warmup wall-clock helper that blocks on device
    results (correct under async dispatch).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax


class Timer:
    """Median-of-reps wall timer with compile warmup."""

    def __init__(self, warmup: int = 1, reps: int = 5):
        self.warmup = warmup
        self.reps = reps

    def time(self, fn: Callable, *args) -> float:
        """Seconds per call of jit(fn)(*args), device-synchronized."""
        f = jax.jit(fn)
        for _ in range(self.warmup):
            out = f(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(self.reps):
            out = f(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / self.reps


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler device trace into `logdir`."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def stage_timings(
    scene,
    camera,
    cfg=None,
    sh_degree: int = 3,
    reps: int = 5,
    include_backward: bool = True,
) -> Dict[str, float]:
    """Per-stage seconds of one frame at this scene/camera/config.

    Stages: sh_eval, projection, binning, payload, rasterize_fwd,
    full_forward, and (optionally) full_fwd_bwd.
    """
    import jax.numpy as jnp

    from ..config import RenderConfig
    from ..ops.binning import bin_gaussians
    from ..ops.projection import project_gaussians, tile_grid
    from ..ops.render import build_payload, render
    from ..ops.rasterize_pallas import rasterize_forward
    from ..ops.sh_eval import compute_colors

    cfg = cfg or RenderConfig()
    width, height = camera.width, camera.height
    view = camera.to_view()
    grid_x, grid_y = tile_grid(width, height)
    means, scales, quats, opac, sh = scene.render_args()
    t = Timer(reps=reps)
    out: Dict[str, float] = {}

    out["sh_eval"] = t.time(
        lambda m, s: compute_colors(m, s, view.position, sh_degree), means, sh
    )
    out["projection"] = t.time(
        lambda m, s, q: project_gaussians(
            m, s, q, view, cfg, width=width, height=height
        ),
        means,
        scales,
        quats,
    )
    proj = jax.jit(
        lambda m, s, q: project_gaussians(
            m, s, q, view, cfg, width=width, height=height
        )
    )(means, scales, quats)
    out["binning"] = t.time(
        lambda p: bin_gaussians(p, grid_x, grid_y, cfg.max_pairs), proj
    )
    binned = jax.jit(
        lambda p: bin_gaussians(p, grid_x, grid_y, cfg.max_pairs)
    )(proj)
    colors = jax.jit(
        lambda m, s: compute_colors(m, s, view.position, sh_degree)
    )(means, sh)
    out["payload"] = t.time(
        lambda pr, c, o, b: build_payload(pr, c, o, b), proj, colors, opac, binned
    )
    payload = jax.jit(build_payload)(proj, colors, opac, binned)
    out["rasterize_fwd"] = t.time(
        lambda p: rasterize_forward(
            p, binned.tile_starts, binned.tile_counts, grid_x, width, height, cfg
        ),
        payload,
    )
    out["full_forward"] = t.time(
        lambda *a: render(*a, camera, cfg=cfg, sh_degree=sh_degree),
        means, scales, quats, opac, sh,
    )
    if include_backward:
        out["full_fwd_bwd"] = t.time(
            jax.value_and_grad(
                lambda *a: jnp.sum(render(*a, camera, cfg=cfg, sh_degree=sh_degree)),
                argnums=(0, 1, 2, 3, 4),
            ),
            means, scales, quats, opac, sh,
        )
    return out
