"""ICI traffic model: bytes through all-to-all per frame vs device count.

Measures — from the COMPILED HLO on a virtual CPU mesh — the total
all-to-all operand bytes per chip per frame for the sharded render at
each mesh size, for both the f32 exchange and the bf16-packed exchange
(parallel/exchange_vjp.py). This is the evidence behind the >=90%
1->16 scaling claim (SURVEY.md section 5 distributed backend): with the
auto-derived exchange_capacity (skew * max_pairs_local / ndev rows per
bucket), each chip sends ndev * bcap ~= skew * max_pairs_local rows
regardless of ndev — per-chip ICI bytes are FLAT in device count while
per-chip compute (expansion, sort, rasterization band) shrinks 1/ndev.

Reference bar: the reference scales by NCCL peer copies whose per-GPU
traffic also stays ~flat; ours rides ICI via one XLA all-to-all.

Usage: python -u scripts/perf/ici_traffic.py   (CPU only; no TPU needed)
"""

from __future__ import annotations

import json
import os
import re
import sys

NDEV_MAX = 16
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + f" --xla_force_host_platform_device_count={NDEV_MAX}"
    ).strip()

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo")

from luisacomputegaussiansplatting_tpu.config import RenderConfig
from luisacomputegaussiansplatting_tpu.io.synthetic import random_scene
from luisacomputegaussiansplatting_tpu.parallel.mesh import make_mesh
from luisacomputegaussiansplatting_tpu.parallel.render_sharded import (
    ShardedRenderConfig, derive_exchange_capacity, render_sharded,
)
from luisacomputegaussiansplatting_tpu.utils.camera import look_at_camera

_DTYPE_BYTES = {"f32": 4, "s32": 4, "u32": 4, "f64": 8, "bf16": 2,
                "f16": 2, "s64": 8, "u64": 8, "pred": 1, "s8": 1, "u8": 1}

# a shaped component, e.g. "f32[1,49152,9]{2,1,0}" — appears once per
# peer in the tuple result of each all-to-all definition line
_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def a2a_bytes_per_chip(hlo_text: str) -> tuple[int, int]:
    """(total result bytes of all all-to-all ops, op count) in the module.

    HLO is SPMD (per-chip program), so shapes are per-chip already;
    result bytes == send bytes == recv bytes for all-to-all. Definition
    lines look like ``%all-to-all.2 = (f32[1,B,9]{..}, ...xN peers)
    all-to-all(...)`` — sum every shaped tuple component on the LHS.
    """
    total = 0
    n = 0
    for line in hlo_text.splitlines():
        if " all-to-all(" not in line:
            continue
        lhs = line.split(" all-to-all(", 1)[0]
        for m in _SHAPE_RE.finditer(lhs):
            dt, dims = m.group(1), m.group(2)
            if dt not in _DTYPE_BYTES:
                continue
            elems = 1
            for d in dims.split(","):
                if d:
                    elems *= int(d)
            total += elems * _DTYPE_BYTES[dt]
        n += 1
    return total, n


def run(ndev: int, payload_dtype: str, mpl: int, width: int, height: int,
        n_gauss: int):
    mesh = make_mesh((ndev,), ("gs",), devices=jax.devices()[:ndev])
    cfg = RenderConfig(
        max_pairs=mpl, tile=32, pack_mode="none", tile_cull=True,
        tight_radius=True, payload_dtype=payload_dtype, interpret=True,
    )
    scfg = ShardedRenderConfig(max_pairs_local=mpl)
    cam = look_at_camera((3.0, -2.5, 2.0), (0, 0, 0), (0, 0, 1),
                         fov=70.0, width=width, height=height)
    scene = random_scene(n_gauss, seed=0).pad_to(
        -(-n_gauss // ndev) * ndev
    )

    def f(*args):
        img, aux = render_sharded(
            *args, cam, mesh, cfg=cfg, scfg=scfg,
            width=width, height=height,
        )
        return img, aux

    lowered = jax.jit(f).lower(*scene.render_args())
    hlo = lowered.compile().as_text()
    nbytes, nops = a2a_bytes_per_chip(hlo)
    bcap = derive_exchange_capacity(mpl, ndev, scfg.exchange_skew)
    return {
        "ndev": ndev,
        "payload": payload_dtype,
        "bucket_capacity": bcap,
        "rows_sent_per_chip": ndev * bcap,
        "a2a_ops": nops,
        "a2a_bytes_per_chip": nbytes,
        "a2a_bytes_per_row": round(nbytes / (ndev * bcap), 2),
    }


if __name__ == "__main__":
    # scaled-down geometry (the traffic model is exact in bcap and row
    # bytes, both config-determined; scene size only affects occupancy)
    MPL, W, H, N = 65_536, 256, 256, 20_000
    rows = []
    for dtype in ("f32", "bf16"):
        for ndev in (2, 4, 8, 16):
            r = run(ndev, dtype, MPL, W, H, N)
            rows.append(r)
            print(json.dumps(r), flush=True)
    # the scaling claim: per-chip a2a bytes must be flat (ratio of max
    # to min per payload dtype close to 1)
    for dtype in ("f32", "bf16"):
        vals = [r["a2a_bytes_per_chip"] for r in rows if r["payload"] == dtype]
        print(json.dumps({
            "payload": dtype,
            "flatness_max_over_min": round(max(vals) / min(vals), 4),
        }), flush=True)
