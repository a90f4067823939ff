"""Real-TPU A/B of the Pallas rasterizer fwd+bwd: Mosaic vs interpret.

The verify recipe requires an on-chip A/B after any Pallas kernel change
(interpret parity proves the math, not the Mosaic lowering — round-4
postmortem, BASELINE.md). This feeds ONE payload/starts/counts set to
rasterize_tiles' VJP twice on the same chip — cfg.interpret=False
(Mosaic) vs cfg.interpret=True (same graph via plain XLA) — with a
fixed random cotangent, and compares forward outputs and d_payload
elementwise ON DEVICE (full gradient arrays never cross the tunnel).

Gate: forward <= 1e-5 absolute (Mosaic fuses multiply-adds the
interpret lowering doesn't — measured 2.4e-7, one f32 ULP, on v5e;
entry-loss corruption like the round-4 expansion bug shows as O(1));
d_payload < 1e-3 relative (the MXU moment / b / d_rgb contractions
reassociate the pixel reduction vs interpret's jnp.sum).

Usage: python -u scripts/perf/grad_ab_rast.py [n_gaussians] [WxH]
"""
import dataclasses
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
from luisacomputegaussiansplatting_tpu.ops.binning import bin_gaussians_nopack
from luisacomputegaussiansplatting_tpu.ops.projection import (
    project_gaussians, tile_grid,
)
from luisacomputegaussiansplatting_tpu.ops.rasterize_pallas import (
    rasterize_tiles,
)
from luisacomputegaussiansplatting_tpu.ops.render import build_payload
from luisacomputegaussiansplatting_tpu.ops.sh_eval import compute_colors
from luisacomputegaussiansplatting_tpu.utils.camera import look_at_camera

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
if len(sys.argv) > 2:
    W, H = (int(v) for v in sys.argv[2].split("x"))
else:
    W, H = 800, 600
BLEND = sys.argv[3] if len(sys.argv) > 3 else "vpu"
CFG = RenderConfig(max_pairs=2_000_000, tile=32, pack_mode="none",
                   tile_cull=True, sort_mode="fused", blend_quad=BLEND)

cam = look_at_camera((3.5, -3.0, 2.2), (0.0, 0.0, 0.0), (0.0, 0.0, 1.0),
                     fov=65.0, width=W, height=H)
view = cam.to_view()
scene = random_scene_device(N, seed=0, extent=3.0,
                            scale_range=(0.004, 0.02))
means, scales, quats, opac, sh = scene.render_args()
gx, gy = tile_grid(W, H, CFG.tile_wh)


@jax.jit
def prep(m, s, q, o, shc):
    colors = compute_colors(m, shc, view.position, 3)
    proj = project_gaussians(m, s, q, view, CFG, width=W, height=H)
    binned = bin_gaussians_nopack(
        proj, gx, gy, CFG.max_pairs, o, CFG.tile_wh, CFG.alpha_min,
        CFG.expansion, CFG.max_pairs_sorted, None, CFG.sort_mode,
    )
    payload = build_payload(proj, colors, o, binned,
                            CFG.grad_reduce_dtype, CFG.payload_dtype)
    return payload, binned.tile_starts, binned.tile_counts


payload, starts, counts = prep(means, scales, quats, opac, sh)
s_np, c_np = np.asarray(starts), np.asarray(counts)
print(f"N={N} {W}x{H} capacity={payload.shape[1]} "
      f"entries={int(c_np.sum())}", flush=True)

# gradient columns of chunks no tile range covers are unwritten garbage
# by contract (rasterize_backward docstring): mask them out of the diff
cover = np.zeros(payload.shape[1], bool)
for s0, c0 in zip(s_np, c_np):
    if c0 > 0:
        b0 = (s0 // 128) * 128
        e0 = int(np.ceil((s0 + c0) / 128.0) * 128)
        cover[b0:e0] = True
cover_dev = jnp.asarray(cover[None, :])  # bool (1, capacity)

nt = starts.shape[0]
pix = CFG.tile_wh[0] * CFG.tile_wh[1]
key = jax.random.PRNGKey(7)
dc = jax.random.normal(key, (nt, pix, 3), jnp.float32)
dt = jax.random.normal(jax.random.fold_in(key, 1), (nt, pix, 1),
                       jnp.float32)

# off-TPU smoke runs exercise the harness only (both sides interpret)
cfg_m = dataclasses.replace(
    CFG, interpret=False if jax.default_backend() == "tpu" else True)
cfg_i = dataclasses.replace(CFG, interpret=True)


def fwd_bwd(cfg, p, dc, dt):
    (color, trans), pull = jax.vjp(
        lambda q: rasterize_tiles(q, starts, counts, gx, W, H, cfg), p)
    (d_payload,) = pull((dc, dt))
    # garbage columns can hold NaN: where, not multiply
    return color, trans, jnp.where(cover_dev, d_payload, 0.0)


@jax.jit
def ab(p, dc, dt):
    cm, tm, gm = fwd_bwd(cfg_m, p, dc, dt)
    ci, ti, gi = fwd_bwd(cfg_i, p, dc, dt)
    return dict(
        fwd_c=jnp.abs(cm - ci).max(),
        fwd_t=jnp.abs(tm - ti).max(),
        grad=jnp.abs(gm - gi).max(),
        gscale=jnp.abs(gi).max(),
        gmean=jnp.abs(gi).mean(),
        nnz=(gi != 0).sum(),
    )


r = jax.tree.map(np.asarray, ab(payload, dc, dt))
print(f"fwd max|diff|: color {r['fwd_c']:.3e}  trans {r['fwd_t']:.3e}")
rel = r["grad"] / max(float(r["gscale"]), 1e-30)
print(f"grad max|diff| {r['grad']:.3e}  scale {r['gscale']:.3e}  "
      f"rel {rel:.3e}  nnz {int(r['nnz'])}  mean|g| {r['gmean']:.3e}")
assert r["fwd_c"] <= 1e-5 and r["fwd_t"] <= 1e-5, "FORWARD DIVERGED"
assert rel <= 1e-3, "BACKWARD DIVERGED"
print("GRAD A/B ok")
