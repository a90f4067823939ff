"""Sharded-path overhead on ONE real chip (VERDICT round-2 item 6).

render_sharded on a 1-device mesh vs the single-chip render at the 2M
headline config: the delta bounds the per-chip cost floor of scaling
(exchange buffers, 3-key merge, band reassembly). Chained-dependent
timing. Usage: python -u scripts/perf/sharded_overhead.py {single|sharded}
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
from luisacomputegaussiansplatting_tpu.io.synthetic import random_scene_device as random_scene
from luisacomputegaussiansplatting_tpu.ops.render import render_aux
from luisacomputegaussiansplatting_tpu.parallel.mesh import make_mesh
from luisacomputegaussiansplatting_tpu.parallel.render_sharded import (
    ShardedRenderConfig, render_sharded,
)
from luisacomputegaussiansplatting_tpu.utils.camera import look_at_camera

W, H = 1920, 1080
N = 2_000_000
REPS = 4
CFG = RenderConfig(max_pairs=4_500_000, tile=32, pack_mode="none",
                   tile_cull=True)
SCFG = ShardedRenderConfig(max_pairs_local=4_500_000,
                           exchange_capacity=4_500_000 + (-4_500_000 % 128))

cam = look_at_camera((3.5, -3.0, 2.2), (0.0, 0.0, 0.0), (0.0, 0.0, 1.0),
                     fov=65.0, width=W, height=H)
scene = random_scene(N, seed=0, extent=3.0, scale_range=(0.004, 0.02))
means, scales, quats, opac, sh = scene.render_args()
mode = sys.argv[1]
if "mxu" in sys.argv[2:]:
    # round-5: cover Mosaic-lowered mxu blend kernels INSIDE shard_map
    # on real silicon (the CPU tests only prove interpret semantics)
    import dataclasses

    CFG = dataclasses.replace(CFG, blend_quad="mxu")

# big arrays are explicit jit arguments: closed-over device arrays embed
# as HLO constants and the tunnel's remote_compile 413s on the body size
if mode == "single":
    def f(salt, m, s, q, o, shc):
        img, aux = render_aux(m, s, q, o, shc, cam,
                              bg_color=jnp.zeros(3) + salt, cfg=CFG)
        return img.ravel()[:1], aux.num_rendered
else:
    mesh = make_mesh((1,), ("gs",))

    def f(salt, m, s, q, o, shc):
        img, aux = render_sharded(
            m, s, q, o, shc, cam, mesh,
            bg_color=jnp.zeros(3) + salt, cfg=CFG, scfg=SCFG,
        )
        return img.ravel()[:1], aux.num_rendered


fj = jax.jit(f)
ARGS = (means, scales, quats, opac, sh)


def seq(n, k):
    salt = jnp.float32(k) * 1e-30
    out = fj(salt, *ARGS)
    for _ in range(n - 1):
        out = fj(salt + out[0][0] * 1e-30, *ARGS)
    return out


def fetch(o):
    return jax.tree.map(lambda x: np.asarray(x), o)


t0 = time.perf_counter()
o = fetch(seq(1, 0))
print(f"compiled {time.perf_counter()-t0:.0f}s num_rendered={o[1]}",
      file=sys.stderr)
fetch(seq(REPS, 1))
t0 = time.perf_counter(); fetch(seq(1, 2)); t1 = time.perf_counter() - t0
t0 = time.perf_counter(); fetch(seq(REPS, 3)); tn = time.perf_counter() - t0
per = (tn - t1) / (REPS - 1) * 1e3
print(f"render_{mode}_fwd: {per:.1f} ms  (1rep {t1*1e3:.1f}, {REPS}rep {tn*1e3:.1f})",
      flush=True)
