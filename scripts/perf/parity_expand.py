"""Real-TPU bit-exactness check: Pallas expansion vs the XLA path.

The verify recipe requires this after any binning/expansion change:
render the bench-config frame with expansion="pallas" and "xla" on the
real chip — tile_id/depth/gid and the final image must be bit-exact
(max|diff| == 0), or expansion="auto" is not output-transparent.

Usage: python -u scripts/perf/parity_expand.py [n_gaussians]
"""
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import dataclasses

from luisacomputegaussiansplatting_tpu.config import RenderConfig
from luisacomputegaussiansplatting_tpu.io.synthetic import (
    random_scene_device,
)
from luisacomputegaussiansplatting_tpu.ops.render import render_view
from luisacomputegaussiansplatting_tpu.utils.camera import look_at_camera

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
W, H = 1920, 1080
CFG = RenderConfig(max_pairs=4_500_000, tile=32, pack_mode="none",
                   tile_cull=True, max_pairs_sorted=3_900_000,
                   grad_reduce_dtype="bf16", payload_dtype="bf16",
                   sort_mode="fused")

cam = look_at_camera((3.5, -3.0, 2.2), (0.0, 0.0, 0.0), (0.0, 0.0, 1.0),
                     fov=65.0, width=W, height=H)
scene = random_scene_device(N, seed=0, extent=3.0,
                            scale_range=(0.004, 0.02))
means, scales, quats, opac, sh = scene.render_args()

imgs = {}
for mode in ("pallas", "xla"):
    cfg = dataclasses.replace(CFG, expansion=mode)

    @jax.jit
    def f(m, s, q, o, shc, cfg=cfg):
        img, aux = render_view(m, s, q, o, shc, cam.to_view(), W, H,
                               cfg=cfg)
        return img, aux.num_rendered

    t0 = time.perf_counter()
    img, nr = f(means, scales, quats, opac, sh)
    img = np.asarray(img)
    print(f"{mode}: num_rendered={int(nr)}  "
          f"({time.perf_counter()-t0:.0f}s incl compile)", flush=True)
    imgs[mode] = img

mad = float(np.abs(imgs["pallas"] - imgs["xla"]).max())
print(f"parity pallas-vs-xla @ {N}: max|diff| = {mad}", flush=True)
assert mad == 0.0, "expansion paths diverged"
print("BIT-EXACT ok", flush=True)
