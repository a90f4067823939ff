"""A/B a HISTORICAL expansion kernel (dumped via git show to a file)
against the XLA path on the real chip — bisect tool for locating which
kernel revision diverged on-TPU.

Usage: python -u scripts/perf/expand_ab_old.py <module.py> [N] [s] [w]
"""
import importlib.util
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import numpy as np

sys.path.insert(0, "/root/repo")

from luisacomputegaussiansplatting_tpu.config import RenderConfig
from luisacomputegaussiansplatting_tpu.io.synthetic import (
    random_scene_device,
)
from luisacomputegaussiansplatting_tpu.ops.binning import expand_entries
from luisacomputegaussiansplatting_tpu.ops.projection import (
    project_gaussians, tile_grid,
)
from luisacomputegaussiansplatting_tpu.utils.camera import look_at_camera

path = sys.argv[1]
N = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
spec = importlib.util.spec_from_file_location("expand_old", path)
old = importlib.util.module_from_spec(spec)
spec.loader.exec_module(old)

kw = {}
if len(sys.argv) > 3 and sys.argv[3] != "-":
    kw["s"] = int(sys.argv[3])
if len(sys.argv) > 4 and sys.argv[4] != "-":
    kw["w"] = int(sys.argv[4])

W, H = 1920, 1080
MAXP = int(sys.argv[5]) if len(sys.argv) > 5 else max(N * 3, 300_000)
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

tx, dx, gidx, totx = jax.tree.map(np.asarray, jax.jit(
    lambda p, o: expand_entries(p, gx, gx * gy, MAXP, o, CFG.tile_wh)
)(proj, opac))
tp, dp, gidp, totp = jax.tree.map(np.asarray, jax.jit(
    lambda p, o: old.expand_entries_pallas(p, gx, gx * gy, MAXP, o,
                                           CFG.tile_wh, **kw)
)(proj, opac))
nt = gx * gy
print(f"module={path} N={N} kw={kw}")
print(f"total:  xla={int(totx)}  pallas={int(totp)}")
print(f"valid:  xla={int((tx < nt).sum())}  pallas={int((tp < nt).sum())}")
mm = np.flatnonzero((tx != tp) | (gidx != gidp))
print(f"mismatched slots: {mm.size}")
assert mm.size == 0, "DIVERGED"
print("EXACT ok")

# chained-dependent timing of the historical kernel (same method as
# sweep_expand_sw.py) — for racing kernel revisions in one harness
import time

import jax.numpy as jnp

REPS = 4


@jax.jit
def f(salt, proj, opac):
    p = proj._replace(depth=proj.depth + salt)
    tile_id, depth, gid, total = old.expand_entries_pallas(
        p, gx, gx * gy, MAXP, opac, CFG.tile_wh, **kw
    )
    return tile_id.ravel()[0], depth.ravel()[0], total


def seq(n, k):
    out = f(jnp.float32(k) * 1e-30, proj, opac)
    for _ in range(n - 1):
        out = f(out[1] * 1e-30 + jnp.float32(k) * 1e-30, proj, opac)
    return out


def fetch(o):
    return jax.tree.map(lambda x: np.asarray(x), o)


fetch(seq(REPS, 1))
t0 = time.perf_counter(); fetch(seq(1, 2)); t1 = time.perf_counter() - t0
t0 = time.perf_counter(); fetch(seq(REPS, 3)); tn = time.perf_counter() - t0
per = (tn - t1) / (REPS - 1) * 1e3
print(f"expand_old[{path} N={N} {kw}]: {per:.1f} ms  "
      f"(1rep {t1*1e3:.1f}, {REPS}rep {tn*1e3:.1f})", flush=True)
