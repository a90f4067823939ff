"""Expansion-only A/B: Pallas kernel vs XLA path on the real chip.

Much cheaper to compile than the full-render parity check — used to
localize real-TPU (Mosaic lowering) divergences that interpret-mode
tests cannot catch.

Usage: python -u scripts/perf/expand_ab.py [n_gaussians] [s] [w] [g]
"""
import sys

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
from luisacomputegaussiansplatting_tpu.ops.binning import expand_entries
from luisacomputegaussiansplatting_tpu.ops.expand_pallas import (
    expand_entries_pallas,
)
from luisacomputegaussiansplatting_tpu.ops.projection import (
    project_gaussians, tile_grid,
)
from luisacomputegaussiansplatting_tpu.utils.camera import look_at_camera

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
s_par = int(sys.argv[2]) if len(sys.argv) > 2 else 512
w_par = int(sys.argv[3]) if len(sys.argv) > 3 else 512
g_par = int(sys.argv[4]) if len(sys.argv) > 4 else 8
W, H = 1920, 1080
MAXP = max(N * 3, 300_000)
CFG = RenderConfig(max_pairs=MAXP, tile=32, tile_cull=True)

cam = look_at_camera((3.5, -3.0, 2.2), (0.0, 0.0, 0.0), (0.0, 0.0, 1.0),
                     fov=65.0, width=W, height=H)
view = cam.to_view()
scene = random_scene_device(N, seed=0, extent=3.0,
                            scale_range=(0.004, 0.02))
means, scales, quats, opac, sh = scene.render_args()
gx, gy = tile_grid(W, H, CFG.tile_wh)

proj = jax.jit(
    lambda m, s_, q_: project_gaussians(m, s_, q_, view, CFG, width=W,
                                        height=H)
)(means, scales, quats)
jax.block_until_ready(proj)


@jax.jit
def f_xla(proj, opac):
    return expand_entries(proj, gx, gx * gy, MAXP, opac, CFG.tile_wh)


@jax.jit
def f_pal(proj, opac):
    return expand_entries_pallas(proj, gx, gx * gy, MAXP, opac,
                                 CFG.tile_wh, s=s_par, w=w_par, g=g_par)


tx, dx, gidx, totx = jax.tree.map(np.asarray, f_xla(proj, opac))
tp, dp, gidp, totp = jax.tree.map(np.asarray, f_pal(proj, opac))
nt = gx * gy
print(f"N={N} s={s_par} w={w_par} g={g_par}")
print(f"total:  xla={int(totx)}  pallas={int(totp)}")
print(f"valid:  xla={int((tx < nt).sum())}  pallas={int((tp < nt).sum())}")
mm = np.flatnonzero((tx != tp) | (gidx != gidp))
print(f"mismatched slots: {mm.size}")
if mm.size:
    for i in mm[:8]:
        print(f"  slot {i}: xla(tile={tx[i]}, gid={gidx[i]}, d={dx[i]:.4f})"
              f" pallas(tile={tp[i]}, gid={gidp[i]}, d={dp[i]:.4f})")
    # where do mismatches cluster? (chunk index reveals window/group bugs)
    print("  first/last mismatch:", mm[0], mm[-1],
          " chunks:", mm[0] // s_par, mm[-1] // s_par)
assert mm.size == 0 and int(totx) == int(totp), "DIVERGED"
print("EXACT ok")
