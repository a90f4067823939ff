"""Sweep expansion-kernel chunk size S (output slots per grid step) on
the real TPU at the 6M north-star config. Grid steps = max_pairs / S;
per-step Mosaic overhead ~1-2 us makes S=512 (25K steps) overhead-bound.

Usage: python -u scripts/perf/sweep_expand_chunk.py <S>
"""
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import luisacomputegaussiansplatting_tpu.ops.expand_pallas as ep

S = int(sys.argv[1])

from luisacomputegaussiansplatting_tpu.config import RenderConfig
from luisacomputegaussiansplatting_tpu.io.synthetic import random_scene_device as random_scene
from luisacomputegaussiansplatting_tpu.ops.projection import (
    project_gaussians, tile_grid,
)
from luisacomputegaussiansplatting_tpu.utils.camera import look_at_camera

W, H = 1920, 1080
N = 6_000_000
MAXP = 13_000_000
REPS = 4
CFG = RenderConfig(max_pairs=MAXP, tile=32, pack_mode="none", tile_cull=True)

cam = look_at_camera((3.5, -3.0, 2.2), (0.0, 0.0, 0.0), (0.0, 0.0, 1.0),
                     fov=65.0, width=W, height=H)
view = cam.to_view()
scene = random_scene(N, seed=0, extent=3.0, scale_range=(0.004, 0.02))
means, scales, quats, opac, sh = scene.render_args()
gx, gy = tile_grid(W, H, CFG.tile_wh)
num_tiles = gx * gy

proj = jax.jit(
    lambda m, s, q: project_gaussians(m, s, q, view, CFG, width=W, height=H)
)(means, scales, quats)
proj = jax.block_until_ready(proj)


def run(salt, pr, op):
    # s must be passed explicitly: the old `ep.S = S` module patch was a
    # no-op once the function gained an `s=S` default (bound at def time)
    tile_id, depth, gid, total = ep.expand_entries_pallas(
        pr, gx, num_tiles, MAXP, op, CFG.tile_wh, CFG.alpha_min, s=S,
    )
    return tile_id.astype(jnp.int32).ravel()[:1], depth.ravel()[:1], total


fj = jax.jit(run)


def seq(n, k):
    pr = proj._replace(depth=proj.depth + jnp.float32(k) * 1e-30)
    out = fj(jnp.float32(0), pr, opac)
    for _ in range(n - 1):
        pr = pr._replace(depth=pr.depth + out[1][0] * 1e-30)
        out = fj(jnp.float32(0), pr, opac)
    return out


def fetch(o):
    return jax.tree.map(lambda x: np.asarray(x), o)


t0 = time.perf_counter()
fetch(seq(1, 0))
print(f"compiled {time.perf_counter()-t0:.0f}s", file=sys.stderr)
fetch(seq(REPS, 1))
t0 = time.perf_counter(); fetch(seq(1, 2)); t1 = time.perf_counter() - t0
t0 = time.perf_counter(); fetch(seq(REPS, 3)); tn = time.perf_counter() - t0
per = (tn - t1) / (REPS - 1) * 1e3
print(f"expand_S{S}: {per:.1f} ms  (1rep {t1*1e3:.1f}, {REPS}rep {tn*1e3:.1f})",
      flush=True)
