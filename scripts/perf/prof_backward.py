"""Round-3 backward attribution at the 6M north-star config.

Decomposes fwd+bwd into pullback stages whose sum must equal the whole:
  fwd        : forward render
  rast_bwd   : d_image -> d_payload      (tiles_to_image + rasterizer VJP)
  reduce_bwd : d_payload -> d_table      (gather_payload VJP: sort+segsum)
  params_bwd : d_table -> d_params       (payload_table/proj/SH/packing VJPs)
  total      : full fwd+bwd (for the cross-check)

Chained-dependent timing; one stage per process (axon reliability).
Usage: python -u scripts/perf/prof_backward.py <stage> [ride|rowgather]
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
from luisacomputegaussiansplatting_tpu.ops.binning import bin_gaussians_nopack
from luisacomputegaussiansplatting_tpu.ops.projection import (
    project_gaussians, tile_grid,
)
from luisacomputegaussiansplatting_tpu.ops.render import (
    render_aux, build_payload, payload_table, _tiles_to_image,
)
from luisacomputegaussiansplatting_tpu.ops.rasterize_pallas import (
    rasterize_tiles,
)
from luisacomputegaussiansplatting_tpu.ops.sh_eval import compute_colors
from luisacomputegaussiansplatting_tpu.utils.camera import look_at_camera

W, H = 1920, 1080
N = 6_000_000
REPS = 4
CFG = RenderConfig(max_pairs=13_000_000, tile=32, pack_mode="none",
                   tile_cull=True, max_pairs_sorted=10_600_000,
                   grad_reduce_dtype="bf16", payload_dtype="bf16",
                   sort_mode="fused")

cam = look_at_camera((3.5, -3.0, 2.2), (0.0, 0.0, 0.0), (0.0, 0.0, 1.0),
                     fov=65.0, width=W, height=H)
view = cam.to_view()
print("prof: generating scene...", file=sys.stderr, flush=True)
scene = random_scene(N, seed=0, extent=3.0, scale_range=(0.004, 0.02))
means, scales, quats, opac, sh = scene.render_args()
jax.block_until_ready(means)
print("prof: scene ready", file=sys.stderr, flush=True)
gx, gy = tile_grid(W, H, CFG.tile_wh)


def opaque(out):
    return jax.tree.leaves(out)[0].ravel()[0].astype(jnp.float32) * 1e-30


def timeit(name, fn, args, reps=REPS):
    """fn(salt, *args) -> pytree. ONE compiled graph; reps chain through
    a lazy device scalar (no host fetch between dispatches, so the
    python loop pipelines; per-op = (t_n - t_1)/(n-1) cancels the RTT).
    Each rep's salt is data-dependent on the previous output => no
    dispatch/result cache can serve it. Outputs are reduced to scalars
    INSIDE the jit: fetching full pytrees (e.g. 420 MB of gradients)
    through the ~100 MB/s tunnel would swamp the op being measured."""
    f = jax.jit(
        lambda salt, *a: jax.tree.map(lambda x: x.ravel()[0], fn(salt, *a))
    )

    def seq(n, k):
        salt = jnp.float32(k) * 1e-30
        out = f(salt, *args)
        for _ in range(n - 1):
            out = f(salt + opaque(out), *args)
        return out

    def fetch(o):
        return jax.tree.map(lambda x: np.asarray(x), o)

    t0 = time.perf_counter()
    fetch(seq(1, 0))
    print(f"  [{name}] compiled in {time.perf_counter()-t0:.0f}s",
          file=sys.stderr, flush=True)
    fetch(seq(reps, 1))  # warm dispatch path
    t0 = time.perf_counter(); fetch(seq(1, 2)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); fetch(seq(reps, 3)); tn = time.perf_counter() - t0
    per = (tn - t1) / (reps - 1) * 1e3
    print(f"{name}: {per:.1f} ms  (1rep {t1*1e3:.1f}, {reps}rep {tn*1e3:.1f})",
          flush=True)
    return per


def precompute():
    """Forward intermediates, fetched once (feeds the pullback stages)."""
    @jax.jit
    def f(m, s, q, o, shc):
        colors = compute_colors(m, shc, view.position, 3)
        proj = project_gaussians(m, s, q, view, CFG, width=W, height=H)
        binned = bin_gaussians_nopack(
            proj, gx, gy, CFG.max_pairs, o, CFG.tile_wh, CFG.alpha_min,
            CFG.expansion, CFG.max_pairs_sorted, None, CFG.sort_mode,
        )
        return proj, colors, binned

    return f(means, scales, quats, opac, sh)


def stage_fwd(cfg=None, tag=""):
    cfg = cfg or CFG

    # every big array is an explicit argument: closed-over device arrays
    # embed as HLO constants and the tunnel's remote_compile rejects the
    # oversized body (HTTP 413) at 6M scale
    def f(salt, m, s, q, o, shc):
        img, aux = render_aux(m, s, q, o, shc, cam,
                              bg_color=jnp.zeros(3) + salt, cfg=cfg)
        return img

    timeit(f"fwd{tag}", f, (means, scales, quats, opac, sh))
    # capacity sanity (round-4 lesson: a truncated entry stream measures
    # a cheaper frame and silently flatters every number)
    _p, _c, binned = precompute()
    print(f"fwd{tag}: overflow={bool(np.asarray(binned.overflow))}",
          flush=True)


def stage_fwd_r2():
    """A/B: the round-2 forward config (2-key stable sort, 9-col f32
    payload) vs the production fused/bf16 config — resolves whether the
    isolated sort/gather wins compose inside the full frame."""
    import dataclasses

    cfg = dataclasses.replace(CFG, sort_mode="2key", payload_dtype="f32")
    stage_fwd(cfg, "_r2cfg")


def stage_total(method="ride", argnums=(0, 1, 2, 3, 4)):
    """Full fwd+bwd. argnums matches bench.py (all five params): a
    means-only grad lets XLA DCE the scale/quat/sh pullbacks and reads
    ~50 ms lower at 6M — not the number bench reports."""
    import dataclasses

    cfg = dataclasses.replace(CFG, grad_reduce_method=method)

    def f(salt, m, s, q, o, shc):
        def loss(*params):
            img, aux = render_aux(*params, cam,
                                  bg_color=jnp.zeros(3) + salt, cfg=cfg)
            return jnp.sum(img)

        return jax.grad(loss, argnums=argnums)(m, s, q, o, shc)

    tag = "" if argnums == (0, 1, 2, 3, 4) else "_meansonly"
    timeit(f"total_fwd_bwd[{method}]{tag}", f,
           (means, scales, quats, opac, sh))


def stage_rast():
    proj, colors, binned = precompute()
    payload = jax.jit(build_payload, static_argnums=(4, 5))(
        proj, colors, opac, binned, CFG.grad_reduce_dtype, CFG.payload_dtype
    )

    def f(salt, pl, starts, counts):
        def g(p):
            color, trans = rasterize_tiles(
                p, starts, counts, gx, W, H, CFG
            )
            img_c, img_t = _tiles_to_image(color, trans, gx, gy, W, H,
                                           CFG.tile_wh)
            return jnp.sum(img_c * (1.0 + salt)) + jnp.sum(img_t)

        return jax.grad(g)(pl)

    timeit("rast_bwd", f,
           (payload, binned.tile_starts, binned.tile_counts))


def stage_reduce(method="ride"):
    import luisacomputegaussiansplatting_tpu.ops.segsum as segsum
    # ops/__init__ re-exports the render FUNCTION, shadowing the
    # submodule attribute; resolve the module via sys.modules
    render_mod = sys.modules["luisacomputegaussiansplatting_tpu.ops.render"]

    orig = segsum.reduce_fields_by_id

    forced = method

    def patched(gid, rows, n_out, interpret=False, dtype="f32", **kw):
        kw.pop("method", None)  # the stage arg overrides the caller's
        return orig(gid, rows, n_out, interpret, dtype, forced, **kw)

    render_mod.reduce_fields_by_id = patched

    proj, colors, binned = precompute()
    table = jax.jit(payload_table)(proj, colors, opac)
    cap = binned.entry_gid.shape[0]
    d_payload = jnp.ones((16, cap), jnp.float32)

    def f(salt, tb, gid, d_pl):
        def g(t):
            pl = render_mod.gather_payload(
                t, gid, t.shape[0],
                CFG.grad_reduce_dtype, CFG.payload_dtype,
            )
            return jnp.vdot(pl, d_pl * (1.0 + salt))

        return jax.grad(g)(tb)

    timeit(f"reduce_bwd[{method}]", f, (table, binned.entry_gid, d_payload))


def stage_params():
    d_table = jnp.ones((N, 9), jnp.float32)

    def f(salt, m, s, q, o, shc, d_t):
        def g(mm, ss, qq, oo, sc):
            colors = compute_colors(mm, sc, view.position, 3)
            proj = project_gaussians(mm, ss, qq, view, CFG, width=W, height=H)
            t = payload_table(proj, colors, oo)
            return jnp.vdot(t, d_t * (1.0 + salt))

        return jax.grad(g, argnums=(0, 1, 2, 3, 4))(m, s, q, o, shc)

    timeit("params_bwd", f, (means, scales, quats, opac, sh, d_table))


if __name__ == "__main__":
    if "rect16" in sys.argv[2:]:
        # 32x16 rect-tile variant (RenderConfig.tile_h note): fewer
        # pixels blended per entry at more entries — re-raced under
        # mxu. Halving tile height grows the AABB entry count ~1.5x,
        # so capacities scale up with it (a truncated stream would
        # silently flatter the numbers — round-4 lesson).
        import dataclasses

        CFG = dataclasses.replace(CFG, tile_h=16, max_pairs=20_000_000,
                                  max_pairs_sorted=16_000_000)
        sys.argv = [a for a in sys.argv if a != "rect16"]
    if "mxu" in sys.argv[2:]:
        # blend_quad="mxu" re-measure (round 5); stages read the module
        # CFG at call time, so the swap applies to every stage
        import dataclasses

        CFG = dataclasses.replace(CFG, blend_quad="mxu")
        sys.argv = [a for a in sys.argv if a != "mxu"]
    st = sys.argv[1]
    if st == "reduce":
        stage_reduce(sys.argv[2] if len(sys.argv) > 2 else "ride")
    elif st == "total" and len(sys.argv) > 2:
        stage_total(sys.argv[2])
    else:
        {"fwd": stage_fwd, "fwd_r2": stage_fwd_r2, "total": stage_total,
         "rast": stage_rast, "params": stage_params}[st]()
