"""Expansion-kernel (s, w) sweep at the 6M north-star scale (real TPU).

The fused expansion kernel ran 81 ms at s=512 (BASELINE.md round 2) vs a
~5 ms streaming SOL; at 13M capacity that is ~25K grid steps, so
per-grid-step overhead is the prime suspect. Larger s cuts the step
count linearly (sel matmul VMEM = w*s*4B bounds the product).

Usage: python -u scripts/perf/sweep_expand_sw.py <s> <w> [g] [k]
"""
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from luisacomputegaussiansplatting_tpu.config import RenderConfig
from luisacomputegaussiansplatting_tpu.io.synthetic import (
    random_scene_device,
)
from luisacomputegaussiansplatting_tpu.ops.expand_pallas import (
    expand_entries_pallas,
)
from luisacomputegaussiansplatting_tpu.ops.projection import (
    project_gaussians, tile_grid,
)
from luisacomputegaussiansplatting_tpu.utils.camera import look_at_camera

W, H = 1920, 1080
N = 6_000_000
REPS = 4
s_par = int(sys.argv[1])
w_par = int(sys.argv[2])
g_par = int(sys.argv[3]) if len(sys.argv) > 3 else 8
k_par = int(sys.argv[4]) if len(sys.argv) > 4 else 4
# optional capacity override for capacity-matched races vs historical
# kernels (VERDICT r4 item 2)
MAXP = int(sys.argv[5]) if len(sys.argv) > 5 else 13_000_000
CFG = RenderConfig(max_pairs=MAXP, tile=32, tile_cull=True)

cam = look_at_camera((3.5, -3.0, 2.2), (0.0, 0.0, 0.0), (0.0, 0.0, 1.0),
                     fov=65.0, width=W, height=H)
view = cam.to_view()
scene = random_scene_device(N, seed=0, extent=3.0, scale_range=(0.004, 0.02))
means, scales, quats, opac, sh = scene.render_args()
gx, gy = tile_grid(W, H, CFG.tile_wh)

proj = jax.jit(
    lambda m, s_, q_: project_gaussians(m, s_, q_, view, CFG, width=W,
                                        height=H, opacities=None)
)(means, scales, quats)
jax.block_until_ready(proj)


# all big arrays are explicit jit ARGUMENTS: closed-over device arrays
# are embedded as HLO constants and the tunnel's remote_compile rejects
# bodies past a length limit (HTTP 413) at 6M scale
@jax.jit
def f(salt, proj, opac):
    # salt perturbs depth (a streamed field) -> fresh work every call
    p = proj._replace(depth=proj.depth + salt)
    tile_id, depth, gid, total = expand_entries_pallas(
        p, gx, gx * gy, CFG.max_pairs, opac, CFG.tile_wh,
        s=s_par, w=w_par, g=g_par, k=k_par,
    )
    return tile_id.ravel()[0], depth.ravel()[0], total


def seq(n, k):
    out = f(jnp.float32(k) * 1e-30, proj, opac)
    for _ in range(n - 1):
        out = f(out[1] * 1e-30 + jnp.float32(k) * 1e-30, proj, opac)
    return out


def fetch(o):
    return jax.tree.map(lambda x: np.asarray(x), o)


t0 = time.perf_counter()
o = fetch(seq(1, 0))
print(f"  compiled {time.perf_counter()-t0:.0f}s total={o[2]}",
      file=sys.stderr, flush=True)
fetch(seq(REPS, 1))
t0 = time.perf_counter(); fetch(seq(1, 2)); t1 = time.perf_counter() - t0
t0 = time.perf_counter(); fetch(seq(REPS, 3)); tn = time.perf_counter() - t0
per = (tn - t1) / (REPS - 1) * 1e3
print(f"expand[s={s_par},w={w_par},g={g_par},k={k_par},cap={MAXP}]: {per:.1f} ms  "
      f"(1rep {t1*1e3:.1f}, {REPS}rep {tn*1e3:.1f})", flush=True)
