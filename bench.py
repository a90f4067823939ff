"""Benchmark harness: the BASELINE.json north-star metric.

Measures pixels/s/chip for forward+backward at 1080p on synthetic scenes
(the reference's released .ply scenes are not available in this
environment; scenes are tuned to comparable workloads). Two scales run:

  * headline: 2M gaussians / ~7.8M AABB pairs — the config every round
    has tracked. Caveat on vs_baseline: the denominator is round 1's
    recorded figure, which was measured with the repeat-identical
    timing method (10-20% flattering, BASELINE.md) on the numpy-RNG
    scene; the numerator now uses the honest chained-dependent method
    on the device-RNG scene (different realization, ~same pair count).
    Both deltas BIAS vs_baseline DOWN — the printed ratio understates
    the true improvement and is safe to gate on, but it is not strictly
    like-for-like.
  * north_star: 6M gaussians / ~12.6M AABB pairs — the BASELINE.json
    metric's mip360_bicycle scale.

Timing method (honest on the axon tunnel): each repetition's traced bg
input depends on the previous repetition's loss value, so repeats can
never be served from any dispatch/result cache (repeat-identical calls
measured 10-20% flattering, BASELINE.md round-2 note; reference FPS
contract: app/main.cpp:317-320).

Prints ONE json line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
   "timing": "chained-dependent", "north_star": {...}}

The reference publishes no numbers (BASELINE.md), so vs_baseline is
measured against our own round-1 figure recorded below — i.e. round 1
defines 1.0 and later rounds must beat it. Each scale runs in its own
subprocess under a timeout: a wedged tunnel compile degrades the output
instead of hanging the driver.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

# Round-1 recorded figure (pixels/s/chip, fwd+bwd, the 2M headline
# config), measured 2026-08-16 on TPU v5e (1 chip). Never redefined;
# later rounds must beat it. See BASELINE.md.
ROUND1_BASELINE = 1_913_465.0

WIDTH, HEIGHT = 1920, 1080

# (n_gaussians, cfg kwargs, timed reps)
CONFIGS = {
    # production-fast configuration: tile=32 no-pack with the in-kernel
    # ellipse cull, post-sort capacity trim, bf16-packed gradient
    # reduction and bf16-packed payload gather (see BASELINE.md for the
    # per-stage numbers)
    "headline": (
        2_000_000,
        dict(max_pairs=4_500_000, tile=32, pack_mode="none",
             tile_cull=True, max_pairs_sorted=3_900_000,
             grad_reduce_dtype="bf16", payload_dtype="bf16",
             sort_mode="fused", blend_quad="mxu"),
        10,
    ),
    # the BASELINE.json north-star scale (~bicycle: 6M gaussians)
    "north_star": (
        6_000_000,
        dict(max_pairs=13_000_000, tile=32, pack_mode="none",
             tile_cull=True, max_pairs_sorted=10_600_000,
             grad_reduce_dtype="bf16", payload_dtype="bf16",
             sort_mode="fused", blend_quad="mxu"),
        5,
    ),
}


def run_child(name: str) -> None:
    """Measure one config on the real chip; print {"px_s": ...}."""
    import jax

    # persistent compile cache: axon-tunnel compiles of the full frame
    # take 1-3 min and are flaky; cache them across bench runs
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from luisacomputegaussiansplatting_tpu.config import RenderConfig
    from luisacomputegaussiansplatting_tpu.io.synthetic import (
        random_scene_device,
    )
    from luisacomputegaussiansplatting_tpu.ops.render import render_aux
    from luisacomputegaussiansplatting_tpu.utils.camera import look_at_camera

    n_gaussians, cfg_kwargs, reps = CONFIGS[name]
    cfg = RenderConfig(**cfg_kwargs)

    cam = look_at_camera(
        (3.5, -3.0, 2.2), (0.0, 0.0, 0.0), (0.0, 0.0, 1.0),
        fov=65.0, width=WIDTH, height=HEIGHT,
    )
    # device-side generation: host numpy + upload of the 6M scene costs
    # ~6 min through the axon tunnel (same distributions either way)
    scene = random_scene_device(
        n_gaussians, seed=0, extent=3.0, scale_range=(0.004, 0.02)
    )
    args = scene.render_args()

    def loss(means, scales, quats, opac, sh, bg):
        img, aux = render_aux(
            means, scales, quats, opac, sh, cam, bg_color=bg, cfg=cfg
        )
        return jnp.sum(img), aux.overflow

    # one compile: the overflow flag rides value_and_grad's aux output
    # (overflow would silently drop entries and flatter the numbers)
    step = jax.jit(
        jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4), has_aux=True)
    )

    bg0 = jnp.zeros((3,), jnp.float32)
    print(f"bench[{name}]: compiling fwd+bwd...", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    (val, overflow), _g = step(*args, bg0)
    jax.block_until_ready(_g)
    print(f"bench[{name}]: compiled in {time.perf_counter() - t0:.0f}s",
          file=sys.stderr, flush=True)
    assert not bool(overflow), "bench capacity overflow: raise max_pairs"

    # honest timing: rep i's bg depends on rep i-1's loss value, so no
    # repetition can be cached/deduplicated by the dispatch stack
    t0 = time.perf_counter()
    for _ in range(reps):
        bg = bg0 + val * 1e-20
        (val, _overflow), g = step(*args, bg)
    jax.block_until_ready((val, g))
    dt = (time.perf_counter() - t0) / reps

    print(json.dumps({"px_s": WIDTH * HEIGHT / dt, "ms": dt * 1e3}))


def _wait_device_healthy(max_wait_s: float) -> None:
    """Poll a non-killing trivial-op probe until it completes (rc 0).

    Spawned once per wedge window: killing probes is itself the wedge
    trigger, so the probe process is never killed before max_wait_s.
    """
    code = ("import jax, jax.numpy as jnp;"
            "print(float((jnp.ones((8,128))+1.0).sum()))")
    t0 = time.perf_counter()
    p = subprocess.Popen([sys.executable, "-c", code],
                         stdout=subprocess.DEVNULL,
                         stderr=subprocess.DEVNULL)
    while time.perf_counter() - t0 < max_wait_s:
        rc = p.poll()
        if rc == 0:
            print(f"bench: device healthy after "
                  f"{time.perf_counter() - t0:.0f}s", file=sys.stderr,
                  flush=True)
            return
        if rc is not None:  # probe crashed; respawn
            time.sleep(30)
            p = subprocess.Popen([sys.executable, "-c", code],
                                 stdout=subprocess.DEVNULL,
                                 stderr=subprocess.DEVNULL)
        time.sleep(10)
    p.kill()
    print("bench: device still unhealthy; retrying anyway",
          file=sys.stderr, flush=True)


def main():
    me = os.path.abspath(__file__)
    results = {}
    # The axon tunnel's compile path is intermittently degraded (observed
    # 2026-08-19: a trivial dispatch took 41 s and full-frame compiles
    # exceeded 28 min). The timeout is env-overridable and each scale
    # gets one retry: every sub-program compiled before the wedge (scene
    # gen, and the frame itself once any attempt finishes it) is served
    # from the persistent cache (/tmp/jaxcache), so retries resume ahead.
    child_timeout = float(os.environ.get("BENCH_CHILD_TIMEOUT", "900"))
    for name in ("headline", "north_star"):
        for attempt in (1, 2):
            try:
                proc = subprocess.run(
                    [sys.executable, "-u", me, "--child", name],
                    capture_output=True, text=True, timeout=child_timeout,
                )
                line = proc.stdout.strip().splitlines()[-1]
                results[name] = json.loads(line)
                break
            except Exception as e:  # timeout, crash, bad output
                print(f"bench[{name}] attempt {attempt} failed: {e!r}",
                      file=sys.stderr, flush=True)
                results[name] = None
                if isinstance(e, subprocess.TimeoutExpired) and attempt == 1:
                    # a timeout-KILLED TPU process wedges the device
                    # 5-20 min (verify SKILL.md); wait for a trivial
                    # dispatch to succeed before burning the retry
                    _wait_device_healthy(
                        float(os.environ.get("BENCH_RECOVERY_WAIT", "900"))
                    )

    head = results.get("headline")
    ns = results.get("north_star")
    out = {
        "metric": "pixels_per_s_per_chip_fwd_bwd_1080p",
        "value": round(head["px_s"], 1) if head else None,
        "unit": "pixels/s/chip",
        "vs_baseline": round(head["px_s"] / ROUND1_BASELINE, 4) if head else None,
        "timing": "chained-dependent",
        "north_star": {
            "scene": "6M gaussians (bicycle scale)",
            "pixels_per_s_per_chip": round(ns["px_s"], 1) if ns else None,
            "fwd_bwd_ms": round(ns["ms"], 1) if ns else None,
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        run_child(sys.argv[2])
    else:
        main()
