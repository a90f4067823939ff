"""Pallas TPU tile rasterizer: forward + backward alpha blending.

TPU-native redesign of the reference forward rasterizer
(lcgs/src/gs_tile_splatter/shader.cpp:167-289) plus the backward pass the
reference lacks (README.md:70: forward only).

Design (one grid step = one 16x16 tile, mirroring "block = tile"):

  * The reference stages 256 gaussians into GPU shared memory per round
    (shader.cpp:213-246) and each pixel-thread blends them *sequentially*.
    TPUs have no per-pixel threads; instead each CHUNK=128 sorted entries
    are DMA'd HBM->VMEM (double buffered) and blended against all 256 tile
    pixels at once as dense (256 pixels x 128 gaussians) VPU tiles —
    pixels along sublanes, gaussians along lanes.
  * The sequential dependence of front-to-back compositing
    (T *= 1-alpha) is restructured as a *cumulative log-transmittance*:
      S[p, j] = sum_{k<=j} log(1 - alpha[p, k])
    computed with one (128 x 128) upper-triangular ones matmul on the MXU,
    so the only loop left is over chunks.
  * Blend-rule parity with the reference (shader.cpp:249-274): alpha =
    min(0.99, opacity * exp(power)), contributions skipped when power > 0
    or alpha < 1/255, and blending stops for a pixel once its
    transmittance would fall below 1e-4. Because transmittance is
    monotonically non-increasing, "stop at gaussian j*" is exactly the
    per-entry predicate T_in * exp(S[j]) >= 1e-4 — no sequential scan
    needed.
  * Early tile termination: the chunk loop exits once every pixel in the
    tile is saturated (the reference's per-pixel `done` flag, aggregated
    per tile), with the one speculative in-flight DMA drained on exit.

The backward kernel replays the forward chunk loop and computes analytic
gradients w.r.t. every payload field. The key identity that avoids a
back-to-front second pass: for pixel p,

  sum_{k>j} w_k b_k  =  dot(C_p, G_p) - sum_{k<=j} w_k b_k

where C_p is the *final* pre-background colour (a forward residual),
G_p = dL/dC_p, w_k the blend weights and b_k = dot(c_k, G_p). So a single
front-to-back replay with a carried prefix accumulator yields

  dL/dalpha_j = T_before_j * b_j
                - (suffix_wb_j + T_final * dL/dT_final) / (1 - alpha_j).

Memory layout (all chosen for Mosaic's (sublane, 128-lane) tiling):
  * payload: (FIELDS=9, capacity) float32, field-major. Rows:
    [0] mean_x_px [1] mean_y_px [2] conic_a [3] conic_b [4] conic_c
    [5] opacity (0 marks padding) [6] r [7] g [8] b. Mosaic pads the
    9-sublane VMEM staging tiles internally; slimmer rows mean every
    gather / sort / DMA over the capacity axis moves ~45% fewer bytes
    than a 16-row layout would.
    Entries are pre-sorted by (tile, depth) and every tile's range start /
    length is CHUNK-aligned (binning.py), so each DMA is a lane-aligned
    (16, 128) slice and chunks never straddle tiles.
  * tile outputs / residuals: (num_tiles, tile_w*tile_h, 8) — pixels along
    sublanes, so kernel accumulators (PIX, 1) write out with no transpose.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import CHUNK, TILE, RenderConfig

PIX = TILE * TILE  # pixels per tile at the default tile size
FIELDS = 9  # logical payload rows (mean xy, conic abc, opacity, rgb)
# Physical rows of the kernel-facing payload: Mosaic requires HBM slice
# sublane counts aligned to 8, so the (FIELDS, capacity) array is padded
# to 16 rows at the kernel boundary (XLA-side gathers/sorts stay 9-wide).
PAYLOAD_ROWS = 16

# column layout of the per-tile output: (PIX, 8)
COL_R, COL_G, COL_B, COL_T = 0, 1, 2, 3


def _should_interpret(cfg: RenderConfig) -> bool:
    if cfg.interpret is not None:
        return cfg.interpret
    return jax.default_backend() != "tpu"


def _upper_triangular():
    """(CHUNK, CHUNK) ones on and above the diagonal: x @ UT computes an
    inclusive prefix sum over the gaussian (lane) axis on the MXU.

    Measured on v5e at 12.6M pairs: the kernels are VPU-bound; MXU pass
    count is immaterial (a deliberately-wrong single-pass bf16 variant
    timed identically), so the matmuls simply use exact HIGHEST.
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    return (rows <= cols).astype(jnp.float32)


def _prefix_dot(x, ut):
    """Inclusive prefix sum over lanes via the UT matmul."""
    return jax.lax.dot(
        x, ut, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _tile_dims(cfg: RenderConfig):
    """(tile_w, tile_h, pixels-per-tile)."""
    tw, th = cfg.tile_wh
    return tw, th, tw * th


def _chunk_range(start, count, packed: bool):
    """(base, end, n_chunks) of a tile's CHUNK grid — the invariant the
    forward and backward kernels must share for the backward replay to
    see exactly the forward's chunks.

    packed ("chunk"): ranges are CHUNK-aligned by construction.
    no-pack: read from the 128-aligned chunk grid and mask neighbour-tile
    entries by their global index (end is the exclusive range bound the
    mask needs; None when packed)."""
    if packed:
        return start, None, count // CHUNK
    base = (start // CHUNK) * CHUNK
    end = start + count
    n_chunks = jnp.where(count > 0, (end - base + CHUNK - 1) // CHUNK, 0)
    return base, end, n_chunks


def _pixel_coords(tile_idx, grid_x: int, width: int, height: int,
                  tile_w: int, tile_h: int):
    """Global (x, y) pixel coordinates of a tile's pixels as
    (tile_w*tile_h, 1), plus the initial transmittance (1 in-image, 0 for
    pixels hanging past the image edge — the reference's `inside`
    predicate, gs_tile_splatter/shader.cpp:195-196, which also feeds tile
    early-out)."""
    pix = tile_w * tile_h
    tile_y = tile_idx // grid_x
    tile_x = tile_idx - tile_y * grid_x
    p = jax.lax.broadcasted_iota(jnp.int32, (pix, 1), 0)
    ix = tile_x * tile_w + p % tile_w
    iy = tile_y * tile_h + p // tile_w
    inside = (ix < width) & (iy < height)
    t0 = inside.astype(jnp.float32)
    return ix.astype(jnp.float32), iy.astype(jnp.float32), t0


def _quad_basis(px, py, tx0, ty0, pix):
    """(pix, 8) TILE-LOCAL pixel polynomial basis [1, x, y, x^2, y^2,
    xy, 0, 0] for the MXU power contraction. Tile-local coordinates for
    the same reason as the backward moment basis: global coords make
    the recombination cancel catastrophically in f32."""
    xl = px - tx0  # (pix, 1)
    yl = py - ty0
    one = jnp.ones((pix, 1), jnp.float32)
    zero = jnp.zeros((pix, 1), jnp.float32)
    return jnp.concatenate(
        [one, xl, yl, xl * xl, yl * yl, xl * yl, zero, zero], axis=1)


# blend_quad="mxu" guard band on the reference's power > 0 skip
# (shader.cpp:257): the MXU-evaluated power carries ~1e-6 absolute
# contraction error, so near-boundary contributions are KEPT (alpha
# stays alpha_max-clamped) instead of randomly dropped at the exact
# splat centre, where power == 0 and alpha == opacity.
POWER_GUARD = 1e-3


def _chunk_blend(buf, px, py, t_in, ut, cfg: RenderConfig, range_mask=None,
                 need_report=True, quad_basis=None, origin=None):
    """Shared forward math for one chunk.

    Args:
      buf: (FIELDS, CHUNK) payload slice in VMEM.
      px, py: (PIX, 1) pixel coordinates.
      t_in: (PIX, 1) incoming CHAIN transmittance — the product of
        (1 - alpha) over every previous live entry, applied or not (see
        t_chain below). Before the first rejected entry this equals the
        applied-only transmittance; after one it is < transmittance_eps
        forever, which is exactly what keeps the reference's per-pixel
        `done` latch sticky across chunks (shader.cpp:257-266 sets done
        and stops WITHOUT applying the entry that would cross eps).
      ut: (CHUNK, CHUNK) upper-triangular ones.
      range_mask: optional (1, CHUNK) bool; False lanes are neighbour-tile
        entries from an aligned over-read (pack_mode "none") and must not
        contribute.
      quad_basis/origin: blend_quad="mxu" operands — the per-tile
        (pix, 8) basis from _quad_basis and the (tx0, ty0) tile origin.

    Returns dict of (PIX, CHUNK) / (PIX, 1) intermediates. Carry
    contract for the chunk loops: feed `t_chain` into the next chunk's
    t_in; report `t_last` (the last APPLIED value, the reference's
    output T) only where `has_applied`, else keep the previous report.
    Both carries agree until the first rejection, after which nothing
    is ever applied again (chain < eps and monotone non-increasing), so
    weights computed from the chain are exact for every applied entry.
    """
    ca = buf[2:3, :]  # (1, CHUNK)
    cb = buf[3:4, :]
    cc = buf[4:5, :]
    op = buf[5:6, :]

    if cfg.blend_quad == "mxu":
        tx0, ty0 = origin
        mxl = buf[0:1, :] - tx0  # tile-local means
        myl = buf[1:2, :] - ty0
        # clamp keeps padding (op == 0) finite: ln(1e-30) = -69 drives
        # alpha to 0 without feeding the MXU a -inf (whose bf16 split
        # would poison the contraction with NaNs)
        ln_op = jnp.log(jnp.maximum(op, 1e-30))
        # power'(p, k) = power(p, k) + ln op_k, expanded over the
        # tile-local basis (dx = mxl - x, dy = myl - y): ~10 VPU ops
        # per ENTRY here vs ~12 per PAIR on the vpu path
        a0 = (-0.5 * (ca * mxl * mxl + cc * myl * myl)
              - cb * mxl * myl + ln_op)
        bx = ca * mxl + cb * myl
        by = cc * myl + cb * mxl
        zr = jnp.zeros_like(ca)
        coeffs = jnp.concatenate(
            [a0, bx, by, -0.5 * ca, -0.5 * cc, -cb, zr, zr], axis=0)
        powerp = jax.lax.dot(
            quad_basis, coeffs, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)  # (PIX, CHUNK)
        alpha_raw = jnp.exp(powerp)
        # power <= POWER_GUARD  <=>  power' <= ln_op + POWER_GUARD
        pow_ok = powerp <= ln_op + POWER_GUARD
    else:
        mx = buf[0:1, :]
        my = buf[1:2, :]
        dx = mx - px  # (PIX, CHUNK)
        dy = my - py
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        alpha_raw = op * jnp.exp(power)
        pow_ok = power <= 0.0

    clamped = alpha_raw > cfg.alpha_max
    alpha = jnp.minimum(alpha_raw, cfg.alpha_max)
    live = pow_ok & (alpha >= cfg.alpha_min)
    if range_mask is not None:
        live = live & range_mask
    alpha = jnp.where(live, alpha, 0.0)

    log1ma = jnp.log1p(-alpha)
    s_inc = _prefix_dot(log1ma, ut)  # inclusive prefix, gaussian axis
    t_after = t_in * jnp.exp(s_inc)
    # t_before = t_in * exp(s_inc - log1ma) == t_after / (1 - alpha):
    # one reciprocal instead of a second transcendental per pair
    t_before = t_after / (1.0 - alpha)
    applied = (t_after >= cfg.transmittance_eps) & (alpha > 0.0)
    w = jnp.where(applied, t_before * alpha, 0.0)
    # chain over ALL live entries (applied or not): the sticky-done
    # carry — the last t_after column, bit-exact (same exp, same mul)
    t_chain = t_after[:, -1:]
    out = dict(
        alpha=alpha,
        clamped=clamped,
        applied=applied,
        w=w,
        t_before=t_before,
        t_chain=t_chain,
    )
    if need_report:
        # forward-only outputs (the reference's reported T): the backward
        # replay never reads them — need_report=False skips ~3 VPU
        # ops/pair including the cross-lane min reduce
        out["has_applied"] = jnp.any(applied, axis=1, keepdims=True)
        out["t_last"] = jnp.min(
            jnp.where(applied, t_after,
                      jnp.broadcast_to(t_in, t_after.shape)),
            axis=1,
            keepdims=True,
        )
    return out


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _forward_kernel(
    starts_ref,
    counts_ref,
    offset_ref,
    payload_hbm,
    out_ref,
    buf,
    sems,
    *,
    grid_x: int,
    width: int,
    height: int,
    cfg: RenderConfig,
):
    tile = pl.program_id(0)
    start = starts_ref[tile]
    count = counts_ref[tile]
    packed = cfg.pack_mode == "chunk"
    base, end, n_chunks = _chunk_range(start, count, packed)

    tw, th, pix = _tile_dims(cfg)
    # tile-sharded strips: offset_ref[0] is this shard's first global tile
    px, py, t0 = _pixel_coords(offset_ref[0] + tile, grid_x, width, height, tw, th)
    ut = _upper_triangular()
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
    if cfg.blend_quad == "mxu":
        tx0 = (((offset_ref[0] + tile) % grid_x) * tw).astype(jnp.float32)
        ty0 = (((offset_ref[0] + tile) // grid_x) * th).astype(jnp.float32)
        qb, org = _quad_basis(px, py, tx0, ty0, pix), (tx0, ty0)
    else:
        qb, org = None, None

    def chunk_dma(c):
        slot = jax.lax.rem(c, 2)
        # the chunk grid is CHUNK-aligned by construction; tell Mosaic so
        # it can prove the lane-tiling divisibility of the slice offset
        off = pl.multiple_of(base + c * CHUNK, CHUNK)
        return pltpu.make_async_copy(
            payload_hbm.at[:, pl.ds(off, CHUNK)],
            buf.at[slot],
            sems.at[slot],
        )

    @pl.when(n_chunks > 0)
    def _():
        chunk_dma(0).start()

    def cond(carry):
        c, _tc, _to, _cr, _cg, _cb, chain_max = carry
        # once every pixel's chain is below eps nothing can ever apply
        # again (the chain is monotone non-increasing): the reference's
        # sticky done latch, tile-wide
        return (c < n_chunks) & (chain_max >= cfg.transmittance_eps)

    def body(carry):
        c, t_chain, t_out, cr, cg, cb, _m = carry

        @pl.when(c + 1 < n_chunks)
        def _():
            chunk_dma(c + 1).start()

        chunk_dma(c).wait()
        cur = buf[jax.lax.rem(c, 2)]
        if packed:
            rmask = None
        else:
            idx = base + c * CHUNK + lane
            rmask = (idx >= start) & (idx < end)
        f = _chunk_blend(cur, px, py, t_chain, ut, cfg, rmask,
                         quad_basis=qb, origin=org)
        w = f["w"]
        if cfg.blend_quad == "mxu":
            # one (PIX, CHUNK) x (8, CHUNK)^T MXU contraction: cols 0..2
            # are sum_k w * rgb_k (payload rows 9..13 are zero by
            # construction, so cols 3..7 vanish — same invariant as the
            # backward's b matmul)
            acc = jax.lax.dot_general(
                w, cur[6:6 + 8, :],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            cr = cr + acc[:, 0:1]
            cg = cg + acc[:, 1:2]
            cb = cb + acc[:, 2:3]
        else:
            cr = cr + jnp.sum(w * cur[6:7, :], axis=1, keepdims=True)
            cg = cg + jnp.sum(w * cur[7:8, :], axis=1, keepdims=True)
            cb = cb + jnp.sum(w * cur[8:9, :], axis=1, keepdims=True)
        # carry split (see _chunk_blend): chain gates, last-applied reports
        t_out = jnp.where(f["has_applied"], f["t_last"], t_out)
        t_chain = f["t_chain"]
        return (c + 1, t_chain, t_out, cr, cg, cb, jnp.max(t_chain))

    zeros = jnp.zeros((pix, 1), jnp.float32)
    init = (jnp.int32(0), t0, t0, zeros, zeros, zeros, jnp.float32(1.0))
    c_f, _tc, t_fin, cr, cg, cb, _ = jax.lax.while_loop(cond, body, init)

    # drain the speculative DMA if the loop exited early
    @pl.when(c_f < n_chunks)
    def _():
        chunk_dma(c_f).wait()

    pad = jnp.zeros((pix, 4), jnp.float32)
    out_ref[0] = jnp.concatenate([cr, cg, cb, t_fin, pad], axis=1)


def rasterize_forward(
    payload,
    tile_starts,
    tile_counts,
    grid_x: int,
    width: int,
    height: int,
    cfg: RenderConfig,
    tile_offset=None,
):
    """Run the forward kernel.

    Args:
      payload: (PAYLOAD_ROWS, capacity) float32, CHUNK-aligned per tile.
      tile_starts/tile_counts: (num_tiles,) int32.
      grid_x: tiles per row.
      tile_offset: optional (1,) int32 — global index of this shard's
        first tile (tile-sharded strips); defaults to 0.

    Returns:
      (num_tiles, tile_w*tile_h, 8) float32 (tile_w*tile_h from
      cfg.tile_wh: 256 default, 1024 at tile=32): columns
      [r, g, b, T, 0, 0, 0, 0].
    """
    num_tiles = tile_starts.shape[0]
    _tw, _th, pix = _tile_dims(cfg)
    assert pix % 8 == 0, "tile_w * tile_h must be a multiple of 8"
    if tile_offset is None:
        tile_offset = jnp.zeros((1,), jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, pix, 8), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, PAYLOAD_ROWS, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _forward_kernel, grid_x=grid_x, width=width, height=height, cfg=cfg
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, pix, 8), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=_should_interpret(cfg),
    )(tile_starts, tile_counts, tile_offset, payload)


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------


def _backward_kernel(
    starts_ref,
    counts_ref,
    offset_ref,
    payload_hbm,
    res_ref,
    grads_hbm,
    buf,
    gbuf,
    rgbuf,
    sems,
    out_sems,
    rmw_sem,
    *,
    grid_x: int,
    width: int,
    height: int,
    cfg: RenderConfig,
):
    """res_ref columns per tile: [0:3] dL/dC, [3] dL/dT, [4:7] C_final,
    [7] T_final, each (PIX,)."""
    tile = pl.program_id(0)
    start = starts_ref[tile]
    count = counts_ref[tile]
    packed = cfg.pack_mode == "chunk"
    base, end, n_chunks = _chunk_range(start, count, packed)
    tw, th, pix = _tile_dims(cfg)

    px, py, t0 = _pixel_coords(offset_ref[0] + tile, grid_x, width, height, tw, th)
    ut = _upper_triangular()
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)

    res = res_ref[0]  # (pix, 8)
    g_r = res[:, 0:1]
    g_g = res[:, 1:2]
    g_b = res[:, 2:3]
    g_t = res[:, 3:4]
    c_fin_r = res[:, 4:5]
    c_fin_g = res[:, 5:6]
    c_fin_b = res[:, 6:7]
    t_fin = res[:, 7:8]
    # total sum_k w_k b_k over the whole tile == dot(C_final, G) per pixel
    cg_total = c_fin_r * g_r + c_fin_g * g_g + c_fin_b * g_b
    tail = t_fin * g_t  # T_final * dL/dT_final

    # MXU operand shared by every chunk: the (8, pix) pixel polynomial
    # basis of the moment contraction (see body). Built directly in
    # lane-major layout from iotas — no in-kernel transpose. The basis
    # uses TILE-LOCAL pixel coordinates: global coords make the moment
    # recombination cancel catastrophically in f32 (mx^2*S0 terms ~1e6
    # vs gradients ~1e0).
    tx0 = (((offset_ref[0] + tile) % grid_x) * tw).astype(jnp.float32)
    ty0 = (((offset_ref[0] + tile) // grid_x) * th).astype(jnp.float32)
    lane_p = jax.lax.broadcasted_iota(jnp.int32, (1, pix), 1)
    pxl_t = (lane_p % tw).astype(jnp.float32)  # (1, pix) tile-local x
    pyl_t = (lane_p // tw).astype(jnp.float32)
    zrow = jnp.zeros((1, pix), jnp.float32)
    basis_t = jnp.concatenate(
        [jnp.ones((1, pix), jnp.float32), pxl_t, pyl_t, pxl_t * pxl_t,
         pyl_t * pyl_t, pxl_t * pyl_t, zrow, zrow],
        axis=0,
    )  # (8, pix)
    if cfg.blend_quad == "mxu":
        qb, org = _quad_basis(px, py, tx0, ty0, pix), (tx0, ty0)
    else:
        qb, org = None, None

    def in_dma(c):
        slot = jax.lax.rem(c, 2)
        off = pl.multiple_of(base + c * CHUNK, CHUNK)
        return pltpu.make_async_copy(
            payload_hbm.at[:, pl.ds(off, CHUNK)],
            buf.at[slot],
            sems.at[slot],
        )

    def out_dma(c):
        slot = jax.lax.rem(c, 2)
        off = pl.multiple_of(base + c * CHUNK, CHUNK)
        return pltpu.make_async_copy(
            gbuf.at[slot],
            grads_hbm.at[:, pl.ds(off, CHUNK)],
            out_sems.at[slot],
        )

    def out_dma_slot0(c):
        # fixed-slot variant for the zero-fill tail (serialized start/wait)
        off = pl.multiple_of(base + c * CHUNK, CHUNK)
        return pltpu.make_async_copy(
            gbuf.at[0],
            grads_hbm.at[:, pl.ds(off, CHUNK)],
            out_sems.at[0],
        )

    def rmw_in_dma(c, slot_buf, sem):
        # read the existing boundary chunk (written by the previous tile)
        off = pl.multiple_of(base + c * CHUNK, CHUNK)
        return pltpu.make_async_copy(
            grads_hbm.at[:, pl.ds(off, CHUNK)],
            slot_buf,
            sem,
        )

    # no-pack: a misaligned head means chunk 0 is shared with the previous
    # tile's write; its gradients must be ADDED (the previous tile wrote
    # zeros at our lanes, we add zeros at its lanes). The sequential grid
    # plus full end-of-step DMA drains order the accesses.
    head_shared = jnp.logical_and(n_chunks > 0, base < start) if not packed else None

    @pl.when(n_chunks > 0)
    def _():
        in_dma(0).start()

    if not packed:
        # chunk 0 may be shared with the previous tile's write: fetch its
        # current contents so our chunk-0 store ADDS instead of clobbers
        # (the previous tile wrote zeros at our lanes and vice versa)
        @pl.when(head_shared)
        def _():
            dma = rmw_in_dma(0, rgbuf, rmw_sem)
            dma.start()
            dma.wait()

        @pl.when(jnp.logical_not(head_shared))
        def _():
            # 0 * uninitialised-VMEM could be NaN: keep the add a no-op
            rgbuf[...] = jnp.zeros((PAYLOAD_ROWS, CHUNK), jnp.float32)

    def cond(carry):
        c, _t, _p, chain_max = carry
        # post-saturation chunks receive exactly zero gradients (applied
        # is False for every pixel), so stop like the forward pass does
        return (c < n_chunks) & (chain_max >= cfg.transmittance_eps)

    def body(carry):
        c, t_chain, prefix, _m = carry  # (PIX, 1), (PIX, 1)

        @pl.when(c + 1 < n_chunks)
        def _():
            in_dma(c + 1).start()

        in_dma(c).wait()
        slot = jax.lax.rem(c, 2)
        cur = buf[slot]
        if packed:
            rmask = None
        else:
            idx = base + c * CHUNK + lane
            rmask = (idx >= start) & (idx < end)
        f = _chunk_blend(cur, px, py, t_chain, ut, cfg, rmask,
                         need_report=False, quad_basis=qb, origin=org)
        alpha, w, applied = f["alpha"], f["w"], f["applied"]

        hi = jax.lax.Precision.HIGHEST
        # b[p,k] = dot(rgb_k, G_p): one (pix, 8) @ (8, CHUNK) MXU matmul
        # instead of ~5 VPU ops/pair. res columns 3..7 (dT, C_final,
        # T_final) contract against payload rows 9..13, which the
        # payload builders zero by construction (ops/render.build_payload,
        # parallel/render_sharded) — their products vanish exactly.
        b = jax.lax.dot(
            res, cur[6:6 + 8, :], preferred_element_type=jnp.float32,
            precision=hi,
        )
        wb = w * b
        prefix_inc = prefix + _prefix_dot(wb, ut)
        suffix = cg_total - prefix_inc
        d_alpha = f["t_before"] * b - (suffix + tail) / (1.0 - alpha)
        # alpha = min(alpha_max, opacity * g): zero grad where clamped
        live = applied & jnp.logical_not(f["clamped"])
        d_alpha = jnp.where(live, d_alpha, 0.0)
        d_pow = d_alpha * alpha  # d(alpha)/d(power) = opacity * g = alpha

        # The position/conic gradients need six pixel reductions of
        # d_pow against [1, x, y, x^2, y^2, xy]; ONE (8, pix) @ (pix,
        # CHUNK) MXU contraction replaces ~20 VPU ops per pair. The raw
        # moments S0..Sxy recombine per entry ((1, CHUNK) VPU vectors)
        # into the exact quadratic-form gradients because dx = mx - px
        # is affine in px.
        mom = jax.lax.dot(
            basis_t, d_pow, preferred_element_type=jnp.float32, precision=hi
        )  # (8, chunk)
        s0, sx, sy = mom[0:1, :], mom[1:2, :], mom[2:3, :]
        sxx, syy, sxy = mom[3:4, :], mom[4:5, :], mom[5:6, :]

        ca, cb_, cc = cur[2:3, :], cur[3:4, :], cur[4:5, :]
        op = cur[5:6, :]
        mxl = cur[0:1, :] - tx0  # tile-local mean (matches the basis)
        myl = cur[1:2, :] - ty0
        dxs = mxl * s0 - sx  # sum_p d_pow * dx
        dys = myl * s0 - sy
        d_mx = -(ca * dxs + cb_ * dys)
        d_my = -(cc * dys + cb_ * dxs)
        d_ca = -0.5 * (mxl * mxl * s0 - 2.0 * mxl * sx + sxx)
        d_cb = -(mxl * myl * s0 - mxl * sy - myl * sx + sxy)
        d_cc = -0.5 * (myl * myl * s0 - 2.0 * myl * sy + syy)
        # sum_p d_alpha * g == sum_p d_pow / op (alpha = op*g where live)
        d_op = jnp.where(op > 0.0, s0 / jnp.where(op > 0.0, op, 1.0), 0.0)
        # d_rgb[c, k] = sum_p w[p, k] * G[p, c]: contract the pixel axis
        # of res against w on the MXU (one (8, CHUNK) matmul replaces 3
        # cross-sublane VPU reductions); rows 3..7 contract the unused
        # res columns and are discarded
        drgb = jax.lax.dot_general(
            res, w, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=hi,
        )  # (8, CHUNK)
        d_r, d_g, d_b = drgb[0:1, :], drgb[1:2, :], drgb[2:3, :]

        # wait for the slot's previous output DMA before overwriting
        @pl.when(c >= 2)
        def _():
            out_dma(c - 2).wait()

        pad = jnp.zeros((PAYLOAD_ROWS - 9, CHUNK), jnp.float32)
        gvals = jnp.concatenate(
            [d_mx, d_my, d_ca, d_cb, d_cc, d_op, d_r, d_g, d_b, pad], axis=0
        )
        if not packed:
            take_prev = (
                jnp.logical_and(c == 0, head_shared)
            ).astype(jnp.float32)
            gvals = gvals + take_prev * rgbuf[...]
        gbuf[slot] = gvals
        out_dma(c).start()

        t_new = f["t_chain"]
        prefix_new = prefix + jnp.sum(wb, axis=1, keepdims=True)
        return (c + 1, t_new, prefix_new, jnp.max(t_new))

    init = (jnp.int32(0), t0, jnp.zeros((pix, 1), jnp.float32), jnp.float32(1.0))
    c_f, _t, _p, _m = jax.lax.while_loop(cond, body, init)

    # drain the speculative input DMA if the loop exited early
    @pl.when(c_f < n_chunks)
    def _():
        in_dma(c_f).wait()

    # drain trailing output DMAs of the computed chunks
    @pl.when(c_f >= 2)
    def _():
        out_dma(c_f - 2).wait()

    @pl.when(c_f >= 1)
    def _():
        out_dma(c_f - 1).wait()

    # skipped chunks still own payload slots: write their zero gradients
    @pl.when(c_f < n_chunks)
    def _():
        gbuf[0] = jnp.zeros((PAYLOAD_ROWS, CHUNK), jnp.float32)
        # c_f >= 1 whenever this body runs (the while cond starts true
        # for n_chunks > 0), so a shared head chunk was always computed
        # before any early exit — zero-fill starts at c_f unconditionally
        zero_from = c_f

        def zero_body(c, _):
            dma = out_dma_slot0(c)
            dma.start()
            dma.wait()
            return 0

        jax.lax.fori_loop(zero_from, n_chunks, zero_body, 0, unroll=False)


def rasterize_backward(
    payload,
    tile_starts,
    tile_counts,
    residual,
    grid_x: int,
    width: int,
    height: int,
    cfg: RenderConfig,
    tile_offset=None,
):
    """Run the backward kernel.

    Args:
      residual: (num_tiles, tile_w*tile_h, 8): columns
        [dC rgb, dT, C_final rgb, T_final].

    Returns:
      (PAYLOAD_ROWS, capacity) float32 per-entry gradients (payload layout);
      columns of padding entries are unwritten garbage — callers must drop
      entries with gid < 0 (binning guarantees they receive no gradient).
    """
    num_tiles = tile_starts.shape[0]
    _tw, _th, pix = _tile_dims(cfg)
    if tile_offset is None:
        tile_offset = jnp.zeros((1,), jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (1, pix, 8), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, PAYLOAD_ROWS, CHUNK), jnp.float32),
            pltpu.VMEM((2, PAYLOAD_ROWS, CHUNK), jnp.float32),
            pltpu.VMEM((PAYLOAD_ROWS, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(
        _backward_kernel, grid_x=grid_x, width=width, height=height, cfg=cfg
    )
    # no-pack boundary chunks are read-modify-written across neighbouring
    # grid steps: the grid must stay sequential in that mode
    semantics = "parallel" if cfg.pack_mode == "chunk" else "arbitrary"
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(payload.shape, jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(semantics,),
        ),
        interpret=_should_interpret(cfg),
    )(tile_starts, tile_counts, tile_offset, payload, residual)


# ---------------------------------------------------------------------------
# custom-vjp wrapper
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def rasterize_tiles(
    payload,
    tile_starts,
    tile_counts,
    grid_x: int,
    width: int,
    height: int,
    cfg: RenderConfig,
    tile_offset=None,
):
    """Differentiable tile rasterization.

    Returns (color (num_tiles, tile_w*tile_h, 3), transmittance
    (num_tiles, tile_w*tile_h, 1)); tile_w*tile_h follows cfg.tile_wh.
    Gradients flow to ``payload`` only (binning indices are structural).
    """
    out = rasterize_forward(
        payload, tile_starts, tile_counts, grid_x, width, height, cfg, tile_offset
    )
    return out[:, :, 0:3], out[:, :, 3:4]


def _rasterize_fwd(
    payload, tile_starts, tile_counts, grid_x, width, height, cfg, tile_offset=None
):
    out = rasterize_forward(
        payload, tile_starts, tile_counts, grid_x, width, height, cfg, tile_offset
    )
    color, trans = out[:, :, 0:3], out[:, :, 3:4]
    return (color, trans), (
        payload,
        tile_starts,
        tile_counts,
        tile_offset,
        color,
        trans,
    )


def _rasterize_bwd(grid_x, width, height, cfg, res, cotangents):
    payload, tile_starts, tile_counts, tile_offset, color, trans = res
    d_color, d_trans = cotangents
    residual = jnp.concatenate([d_color, d_trans, color, trans], axis=2)
    d_payload = rasterize_backward(
        payload,
        tile_starts,
        tile_counts,
        residual,
        grid_x,
        width,
        height,
        cfg,
        tile_offset,
    )
    zero_int = np.zeros((), dtype=jax.dtypes.float0)
    d_starts = np.broadcast_to(zero_int, tile_starts.shape)
    d_counts = np.broadcast_to(zero_int, tile_counts.shape)
    d_offset = None
    if tile_offset is not None:
        d_offset = np.broadcast_to(zero_int, tile_offset.shape)
    return d_payload, d_starts, d_counts, d_offset


rasterize_tiles.defvjp(_rasterize_fwd, _rasterize_bwd)
