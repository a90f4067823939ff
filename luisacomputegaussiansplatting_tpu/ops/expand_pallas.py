"""Pallas fused tile-rect expansion: gaussians -> (tile, depth, gid) entries.

TPU-native replacement for the XLA expansion in ops/binning.py
(scatter-heads + cummax forward-fill + one (L, K)-row gather), which is
HBM-gather bound: the per-slot row gather costs ~12 ns/row — ~150 ms at
the 13M-entry north-star scale. This kernel exploits *slot contiguity*
instead: output slots of one gaussian are contiguous (starts = exclusive
cumsum of tile counts), so an output chunk of S slots draws from a
CONTIGUOUS row range of the per-gaussian table, which can be streamed
HBM->VMEM sequentially and "gathered" with a one-hot interval-membership
matmul on the MXU:

    sel[s, r]  = (start_r <= slot_s) & (slot_s < end_r)   # disjoint
    vals[:, s] = table_window @ sel^T                     # (F, W) @ (W, S)

The one-hot gather is BIT-EXACT for f32 values: in-kernel, each f32
row splits into three bf16 terms of strictly decreasing magnitude
whose selected products re-sum exactly in the f32 accumulator (sel is
exactly {0, 1}, each slot selects exactly one row). An XLA-side
pre-split variant (3*nf bf16 table rows + one fused matmul) was tried
in round 4 and REVERTED: it silently corrupted the reconstruction on
real TPUs (Mosaic bf16 single-row slicing; bit-exact under interpret,
~99% of entries lost on-chip — BASELINE.md round-4 postmortem), and
its table is 96 B/row vs f32's 64 B, so it also streamed 1.5x the
bytes to save two non-dominant MXU passes.

Each grid step processes ``g`` consecutive output chunks (g * s slots),
streaming the group's whole table-row span once through a k-deep DMA
pipeline. The table is pre-tiled XLA-side into (nf, w) blocks so each
window DMA is one CONTIGUOUS copy: the round-4 sweep showed the kernel
time tracked n_windows x ~8 us of strided-row DMA descriptor overhead
under the old field-major layout (g- and sel-area-invariant, 96-198 ms
across (s, w, g); BASELINE.md round 4), not compute.

Slot offsets ride as (hi = offset >> 12, lo = offset & 4095) f32 pairs
and every comparison happens on CHUNK-RELATIVE values (offset - c*S),
which are exact in f32 wherever the compare outcome is in doubt — so
capacities up to 2^30 pairs work (gaussian count and tile count must
stay < 2^24, grid dims <= 4096; `fits_f32` checks all of it).

With ``opacities`` given, the kernel also applies the exact ellipse-tile
cull from binning.expand_entries in-flight: an entry whose tile cannot
receive any alpha >= alpha_min contribution (closed-form minimum of the
conic quadratic over the tile's pixel box) is invalidated. Unlike the
XLA post-pass (measured net-negative: the per-slot test over the full
capacity cost more than shorter rasterizer ranges saved), the in-kernel
test rides the already-streamed table for ~free and shrinks every
per-tile range downstream.

Reference being replaced: the variable-fanout key scatter
lcgs/src/gs_tile_splatter/shader.cpp:26-69 (shad_copy_with_keys), whose
dynamic-offset scatter has no cheap TPU equivalent (SURVEY.md section 7
"hard parts" (a)).

Emission order within a gaussian is y-outer/x-inner, matching the
reference scatter loop and the XLA path exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: output slots per chunk / table rows per streamed subwindow / chunks
#: per grid step (g * s slots per step)
S = 512
W = 512
G = 8

_F32_EXACT = 1 << 24
_SPLIT = 4096  # offset = hi * _SPLIT + lo, both f32-exact


def fits_f32(max_pairs: int, num_gaussians: int, grid_x: int,
             num_tiles: int) -> bool:
    """All the kernel's f32-exactness preconditions:

    - row ids / rect coords exact in f32 (num_gaussians < 2^24);
    - chunk-relative offsets exact (max_pairs < 2^30; offsets are
      hi/lo-split so only the int32 range binds);
    - the minxy = x + y*_SPLIT pack decodes exactly (grid_x and the
      implied grid_y both <= _SPLIT = 4096);
    - tile ids and the rel()/floor-division arguments stay exact
      (num_tiles < 2^24).
    """
    grid_y = -(-num_tiles // max(grid_x, 1))
    return (
        num_gaussians < _F32_EXACT
        and max_pairs < 2**30
        and grid_x <= _SPLIT
        and grid_y <= _SPLIT
        and num_tiles < _F32_EXACT
    )


def ellipse_tile_reaches(mx, my, ca, cb, cc, op, x0, x1, y0, y1,
                         alpha_min):
    """Exact ellipse-tile reach test: can ANY pixel centre in the box
    [x0,x1]x[y0,y1] receive alpha = op * exp(-q) >= alpha_min? The
    minimum of the convex quadratic q(d) = 0.5 d^T conic d over the box
    is closed-form: 0 if the mean is inside, else the best of the four
    edge-constrained minimizers. Pure elementwise jnp, shared by the XLA
    (binning.expand_entries) and Pallas (_expand_kernel) expansion paths
    — the two MUST stay bit-identical for expansion='auto' to be
    output-transparent."""
    inside = (mx >= x0) & (mx <= x1) & (my >= y0) & (my <= y1)

    def q(dx, dy):
        return 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy

    def edge_x(xe):
        dx = xe - mx
        ys = jnp.clip(my - (cb / jnp.maximum(cc, 1e-12)) * dx, y0, y1)
        return q(dx, ys - my)

    def edge_y(ye):
        dy = ye - my
        xs = jnp.clip(mx - (cb / jnp.maximum(ca, 1e-12)) * dy, x0, x1)
        return q(xs - mx, dy)

    q_min = jnp.where(
        inside,
        0.0,
        jnp.minimum(
            jnp.minimum(edge_x(x0), edge_x(x1)),
            jnp.minimum(edge_y(y0), edge_y(y1)),
        ),
    )
    # alpha = op * exp(-q) >= alpha_min  <=>  q <= log(op / alpha_min)
    return q_min <= jnp.log(jnp.maximum(op, 1e-12) / alpha_min)


def _expand_kernel(
    grp_lo_ref,  # (n_groups,) int32 prefetch: group's first table TILE
    grp_nwin_ref,  # (n_groups,) int32 prefetch: windows (tiles) to stream
    first_win_ref,  # (n_chunks_pad,) int32: chunk's first window in group
    last_win_ref,  # (n_chunks_pad,) int32: chunk's last window (inclusive)
    table_hbm,  # (n_tw, nf, W) f32 field-major table, TILED so each
    #            window is ONE CONTIGUOUS HBM block (round-4 fix: the
    #            field-major (nf, P) layout made every window DMA nf
    #            strided ~1 KB rows, and the measured kernel time tracked
    #            n_windows x ~8 us of per-row descriptor overhead — not
    #            sel compute; BASELINE.md round 4 sweep)
    out_ref,  # (g, 8, S) f32 out: rows [tile_id, depth, gid, pad...]
    buf,  # (k, nf, W) VMEM scratch: k-deep DMA pipeline
    v_ref,  # (g, nf, S) f32 VMEM scratch: per-chunk accumulators
    sems,  # (k,) DMA semaphores
    *,
    grid_x: int,
    num_tiles: int,
    nf: int,
    cull: bool,
    tile_w: int,
    tile_h: int,
    alpha_min: float,
    s: int = S,
    w: int = W,
    g: int = G,
    k: int = 4,
):
    step = pl.program_id(0)
    glo = grp_lo_ref[step]
    nwin = grp_nwin_ref[step]
    i_slot = jax.lax.broadcasted_iota(jnp.int32, (s, 1), 0).astype(
        jnp.float32
    )  # (s, 1) chunk-relative slot index in [0, s)

    def dma(win):
        slot_b = jax.lax.rem(win, k)
        return pltpu.make_async_copy(
            table_hbm.at[glo + win], buf.at[slot_b],
            sems.at[slot_b],
        )

    # the whole group's row span streams CONTINUOUSLY through a k-deep
    # pipeline: the round-2/3 design restarted a 2-deep chain per chunk,
    # which left a DMA-latency drain at every one of the ~25K chunks —
    # the measured dominant cost (~3 µs x n_chunks, BASELINE.md round 4)
    for kw in range(k - 1):
        @pl.when(kw < nwin)
        def _():
            dma(kw).start()

    v_ref[...] = jnp.zeros((g, nf, s), jnp.float32)

    # per-chunk slot bases, split exactly (int32 scalars -> small f32)
    cs = [((step * g + gi) * s) for gi in range(g)]

    def rel(hi, lo_, c_hi, c_lo):
        # chunk-relative offset: exact in f32 wherever the interval
        # compare is in doubt (|rel| < ~num_tiles there); far-away
        # rows may round but keep their sign side
        return (hi - c_hi) * float(_SPLIT) + (lo_ - c_lo)

    def body(win, carry):
        @pl.when(win + (k - 1) < nwin)
        def _():
            dma(win + (k - 1)).start()

        dma(win).wait()
        cur = buf[jax.lax.rem(win, k)]  # (nf, W) f32

        s_hi, s_lo = cur[0:1, :], cur[1:2, :]  # (1, W)
        e_hi, e_lo = cur[2:3, :], cur[3:4, :]
        # one-side 3-term bf16 split of the f32 window, shared by all g
        # chunks: sel is EXACTLY {0, 1}, so only the table side splits;
        # the three terms' selected products re-sum exactly in the f32
        # accumulator (each slot selects exactly one row). In-kernel
        # split on an f32 buffer is the TPU-proven construct — the
        # XLA-side pre-split bf16 table silently corrupted on-chip
        # (BASELINE.md round-4 postmortem).
        t0 = cur.astype(jnp.bfloat16)
        r1 = cur - t0.astype(jnp.float32)
        t1 = r1.astype(jnp.bfloat16)
        t2 = (r1 - t1.astype(jnp.float32)).astype(jnp.bfloat16)

        for gi in range(g):
            c = step * g + gi

            @pl.when(
                jnp.logical_and(
                    win >= first_win_ref[c], win <= last_win_ref[c]
                )
            )
            def _(gi=gi, cb=cs[gi]):
                c_hi = (cb // _SPLIT).astype(jnp.float32)
                c_lo = (cb % _SPLIT).astype(jnp.float32)
                rel_start = rel(s_hi, s_lo, c_hi, c_lo)
                rel_end = rel(e_hi, e_lo, c_hi, c_lo)
                # interval membership: each slot claimed by at most one
                # row (intervals disjoint; zero-extent rows claim none)
                sel = jnp.logical_and(
                    rel_start <= i_slot, i_slot < rel_end
                ).astype(jnp.bfloat16)
                acc = v_ref[gi]
                for t in (t0, t1, t2):
                    acc = acc + jax.lax.dot_general(
                        t,
                        sel,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (nf, S)
                v_ref[gi] = acc

        return carry

    jax.lax.fori_loop(0, nwin, body, 0, unroll=False)

    for gi in range(g):
        vals = v_ref[gi]
        cb = cs[gi]
        c_hi = (cb // _SPLIT).astype(jnp.float32)
        c_lo = (cb % _SPLIT).astype(jnp.float32)

        def rel_s(hi, lo_, c_hi=c_hi, c_lo=c_lo):
            return rel(hi, lo_, c_hi, c_lo)

        i_t = i_slot.reshape(1, s)
        rel_start_s = rel_s(vals[0:1, :], vals[1:2, :])  # (1, S)
        rel_end_s = rel_s(vals[2:3, :], vals[3:4, :])
        # unmatched slots gathered all-zero rows: rel_end = -cbase <= i
        # fails for every chunk (i >= 0), so end doubles as match flag
        matched = i_t < rel_end_s
        minxy = vals[4:5, :]
        rect_w = vals[5:6, :]
        depth = vals[6:7, :]
        rowid = vals[7:8, :]

        local = i_t - rel_start_s
        safe_w = jnp.maximum(rect_w, 1.0)
        # float int division is exact-floor here: operands are exact
        # ints; quotient < 2^13, remainder/divisor bounded away from 1
        ty = jnp.floor(local / safe_w)
        tx = local - ty * safe_w
        min_y = jnp.floor(minxy / float(_SPLIT))
        min_x = minxy - min_y * float(_SPLIT)
        tile_x = min_x + tx
        tile_y = min_y + ty
        tile_id = tile_x + tile_y * grid_x

        if cull:
            # exact ellipse-tile cull: same shared helper as XLA path
            mx, my = vals[8:9, :], vals[9:10, :]
            ca, cb, cc = vals[10:11, :], vals[11:12, :], vals[12:13, :]
            op = vals[13:14, :]
            x0 = tile_x * tile_w
            x1 = x0 + (tile_w - 1)
            y0 = tile_y * tile_h
            y1 = y0 + (tile_h - 1)
            matched = matched & ellipse_tile_reaches(
                mx, my, ca, cb, cc, op, x0, x1, y0, y1, alpha_min
            )

        pad = jnp.zeros((5, s), jnp.float32)
        out_ref[gi] = jnp.concatenate(
            [
                jnp.where(matched, tile_id, float(num_tiles)),
                jnp.where(matched, depth, jnp.inf),
                jnp.where(matched, rowid, -1.0),
                pad,
            ],
            axis=0,
        )


def expand_entries_pallas(
    proj,
    grid_x: int,
    num_tiles: int,
    max_pairs: int,
    opacities=None,
    tile=16,
    alpha_min: float = 1.0 / 255.0,
    interpret: bool = False,
    s: int = S,
    w: int = W,
    g: int = G,
    k: int = 4,
):
    """Pallas expansion; same contract as binning.expand_entries,
    including the optional exact ellipse-tile cull (``opacities``).

    s, w, g, k: output slots per chunk / streamed table rows per
    window / chunks per grid step / DMA pipeline depth. Each grid step
    streams its g chunks' whole row span CONTINUOUSLY through a k-deep
    DMA pipeline with per-chunk VMEM accumulators, and the table is
    pre-tiled so every window is ONE contiguous HBM block: the round-4
    sweep measured the field-major layout's per-window DMA (nf
    strided ~1 KB rows) at ~8 us/window of descriptor overhead, which
    tracked the whole kernel time (96-198 ms across (s, w, g);
    BASELINE.md round 4).

    Returns (tile_id, depth, gid, total): (max_pairs,) arrays; invalid
    slots have tile_id == num_tiles, depth == +inf, gid == -1.
    """
    from .projection import _tile_wh

    # w is the lane dim of every streamed (nf, w) tile and s the lane
    # dim of the accumulators/output (CLAUDE.md Pallas alignment rules)
    if w % 128 or s % 128:
        raise ValueError(f"s ({s}) and w ({w}) must be multiples of 128")
    if g < 1:
        raise ValueError(f"g ({g}) must be >= 1")
    if k < 2:
        raise ValueError(f"k ({k}) must be >= 2 (double buffering)")
    # expansion is structural (sort keys + indices): no gradients flow
    # through it, and pallas_call has no JVP rule — cut the tangent path
    proj = jax.tree.map(jax.lax.stop_gradient, proj)
    cull = opacities is not None
    if cull:
        opacities = jax.lax.stop_gradient(opacities.reshape(-1))
    tw, th = _tile_wh(tile)
    counts = proj.tiles_touched.astype(jnp.int32)
    p = counts.shape[0]
    from .binning import _saturate_total

    ends = jnp.cumsum(counts)
    starts = ends - counts
    total = ends[-1] if p > 0 else jnp.int32(0)
    total = _saturate_total(total, counts)

    n_chunks = -(-max_pairs // s)

    def split(x):
        return x // _SPLIT, x % _SPLIT

    ends_c = jnp.minimum(ends, max_pairs)
    s_hi, s_lo = split(starts)
    e_hi, e_lo = split(ends_c)
    # field-major f32 table; zero rows (start == end == 0) claim nothing
    fields = [
        s_hi.astype(jnp.float32),
        s_lo.astype(jnp.float32),
        e_hi.astype(jnp.float32),
        e_lo.astype(jnp.float32),
        (
            proj.rect_min[:, 0] + proj.rect_min[:, 1] * _SPLIT
        ).astype(jnp.float32),
        jnp.maximum(
            proj.rect_max[:, 0] - proj.rect_min[:, 0], 1
        ).astype(jnp.float32),
        proj.depth.astype(jnp.float32),
        jnp.arange(p, dtype=jnp.float32),  # row id -> gid
    ]
    if cull:
        fields += [
            proj.means2d[:, 0],
            proj.means2d[:, 1],
            proj.conic[:, 0],
            proj.conic[:, 1],
            proj.conic[:, 2],
            opacities,
            jnp.zeros((p,), jnp.float32),
            jnp.zeros((p,), jnp.float32),
        ]
    nf = len(fields)
    table = jnp.stack(fields, axis=0)  # (nf, P)
    # pad the row axis to a whole number of w-row tiles (+1 spare tile:
    # a group whose span ends exactly at P still streams its last,
    # partially-padded window)
    n_tw = -(-p // w) + 1
    table = jnp.concatenate(
        [table, jnp.zeros((nf, n_tw * w - p), jnp.float32)], axis=1
    )
    # tile the row axis: each w-row window becomes ONE contiguous
    # (nf, w) HBM block, so the kernel's window DMA is a single
    # contiguous copy instead of nf strided ~1 KB row reads (which
    # dominated the round-2/3 kernel at ~8 us/window; BASELINE.md
    # round 4). One relayout pass XLA-side (~1 ms at 6M rows) buys it.
    table_t = table.reshape(nf, n_tw, w).transpose(1, 0, 2)

    n_groups = -(-n_chunks // g)
    n_chunks_pad = n_groups * g

    # per-chunk contiguous row spans (two searchsorteds, XLA-side);
    # padding chunks (c >= n_chunks) stream nothing and emit sentinels.
    # Row [lo_c, hi_c) is EXACTLY the set of rows whose interval
    # intersects chunk c's slots (ends/starts are both nondecreasing).
    bounds_lo = jnp.arange(n_chunks_pad, dtype=jnp.int32) * s
    bounds_hi = bounds_lo + s
    lo = jnp.searchsorted(ends, bounds_lo, side="right").astype(jnp.int32)
    hi_c = jnp.searchsorted(starts, bounds_hi, side="left").astype(
        jnp.int32
    )
    hi_c = jnp.maximum(hi_c, lo)
    # group spans in TILE units: lo/hi_c are monotone, so the group's
    # span is its first chunk's lo .. its last chunk's hi
    grp_tlo = lo[::g] // w  # (n_groups,) first tile index
    grp_hi = hi_c[g - 1 :: g]
    grp_nwin = jnp.maximum(
        -(-grp_hi // w) - grp_tlo, 0
    ).astype(jnp.int32)
    # chunk -> window range within its group's stream (inclusive);
    # empty/padding chunks get first > last so the kernel guard never
    # fires for them
    grp_of = jnp.arange(n_chunks_pad, dtype=jnp.int32) // g
    base = grp_tlo[grp_of]
    first_win = lo // w - base
    last_win = (hi_c - 1) // w - base
    empty = hi_c <= lo
    first_win = jnp.where(empty, 1, first_win).astype(jnp.int32)
    last_win = jnp.where(empty, 0, last_win).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_groups,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (g, 8, s), lambda c, *_: (c, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((k, nf, w), jnp.float32),
            pltpu.VMEM((g, nf, s), jnp.float32),
            pltpu.SemaphoreType.DMA((k,)),
        ],
    )
    kernel = functools.partial(
        _expand_kernel, grid_x=grid_x, num_tiles=num_tiles, nf=nf,
        cull=cull, tile_w=tw, tile_h=th, alpha_min=alpha_min, s=s, w=w,
        g=g, k=k,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_chunks_pad, 8, s), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(grp_tlo, grp_nwin, first_win, last_win, table_t)

    # rows 0..2 hold [tile_id, depth, gid] as f32 (ints < 2^24 are exact)
    tile_id = out[:, 0, :].reshape(-1)[:max_pairs].astype(jnp.int32)
    depth = out[:, 1, :].reshape(-1)[:max_pairs]
    gid = out[:, 2, :].reshape(-1)[:max_pairs].astype(jnp.int32)
    return tile_id, depth, gid, total
