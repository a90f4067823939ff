"""A/B tight_radius at the 6M bench config (fwd+bwd, real TPU).

tight_radius replaces the reference's fixed 3-sigma disc
(gs_tile_splatter/shader.cpp:139-148) with the exact alpha_min reach
sqrt(2 ln(o/alpha_min)) sigma — output-exact, fewer expansion entries.
This measures whether the entry-side savings (sort, payload gather,
reduce are all per-entry-taxed) justify flipping it on in bench.py's
headline config. Chained-dependent timing (one process per arm).

Usage: python -u scripts/perf/ab_tight_radius.py {on|off}
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
from luisacomputegaussiansplatting_tpu.ops.render import render_aux
from luisacomputegaussiansplatting_tpu.utils.camera import look_at_camera

W, H = 1920, 1080
N = 6_000_000
REPS = 4
arm = sys.argv[1]
CFG = RenderConfig(
    max_pairs=13_000_000, tile=32, pack_mode="none", tile_cull=True,
    max_pairs_sorted=10_700_000, grad_reduce_dtype="bf16",
    payload_dtype="bf16", sort_mode="fused",
    tight_radius=(arm == "on"),
)

cam = look_at_camera((3.5, -3.0, 2.2), (0.0, 0.0, 0.0), (0.0, 0.0, 1.0),
                     fov=65.0, width=W, height=H)
scene = random_scene_device(N, seed=0, extent=3.0,
                            scale_range=(0.004, 0.02))
means, scales, quats, opac, sh = scene.render_args()


def f(salt):
    def loss(m, s, q, o, c):
        img, aux = render_aux(m, s, q, o, c, cam,
                              bg_color=jnp.zeros(3) + salt, cfg=CFG)
        return jnp.sum(img * img), aux

    (val, aux), grads = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4),
                                           has_aux=True)(
        means, scales, quats, opac, sh
    )
    return val.reshape(1), aux.num_rendered, aux.overflow


fj = jax.jit(f)


def seq(n, k):
    salt = jnp.float32(k) * 1e-30
    out = fj(salt)
    for _ in range(n - 1):
        out = fj(salt + out[0][0] * 1e-30)
    return out


def fetch(o):
    return jax.tree.map(lambda x: np.asarray(x), o)


t0 = time.perf_counter()
o = fetch(seq(1, 0))
print(f"compiled {time.perf_counter()-t0:.0f}s num_rendered={o[1]} "
      f"overflow={o[2]}", file=sys.stderr)
fetch(seq(REPS, 1))
t0 = time.perf_counter(); fetch(seq(1, 2)); t1 = time.perf_counter() - t0
t0 = time.perf_counter(); fetch(seq(REPS, 3)); tn = time.perf_counter() - t0
per = (tn - t1) / (REPS - 1) * 1e3
print(f"tight_radius={arm}: fwd+bwd {per:.1f} ms  num_rendered={o[1]}",
      flush=True)
