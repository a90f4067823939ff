"""Sorted segment-sum: reduce per-entry rows into per-gaussian rows.

This is the TPU-native replacement for the gradient scatter-add that the
graphdeco CUDA rasterizer does with atomics (and that the reference repo
never built — its atomic_add_float3 helper is dead code,
lcgs/include/lcgs/core/sugar.h:37-42). XLA's native scatter-add on TPU
costs ~100 ns/row at these sizes; sorting the rows by gaussian id and
segment-summing them with this kernel is far cheaper end to end.

Algorithm — one Pallas grid step per static id *window* of E ids:

  * entries arrive sorted by id in a field-major (16, L) layout — 9 data
    fields, the id itself as field 9 (ids < 2^24, exact in f32) — so each
    window's entries are one contiguous lane slice, located with two XLA
    searchsorteds (prefetched);
  * the kernel streams that slice in (16, E) chunks, DMA'd at 128-aligned
    lane offsets (over-reading up to 127 neighbour entries is harmless:
    the selection below is value-based);
  * per 128-id strip, a one-hot (128-ids x entries) comparison matrix is
    contracted against the chunk's data fields on the MXU (A @ B^T form),
    accumulating dense per-id sums straight into the window's output
    block;
  * strips are bounded by the chunk's actual id span (first/last id of
    the chunk), so gap-free workloads do ~1 strip-pass per entry.

No carries, no aliasing, no dynamic output offsets: a boundary id whose
entries straddle a chunk boundary is summed by the one window that owns
it, which reads every chunk overlapping its slice. Ids with no entries
keep the zeros their window block was initialised with.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

E = 4096  # ids per window == entries per streamed chunk
_STRIP = 128
_ROWS = 16  # physical sublane count of the entry staging buffer


def _segsum_kernel(
    ent_start_ref,  # (n_windows,) int32 prefetch: first entry of window
    ent_end_ref,  # (n_windows,) int32 prefetch: one-past-last entry
    rows_hbm,  # (_ROWS, L_pad) float32: [0:cols] data, [cols] id as f32
    out_ref,  # (E, cols) VMEM block: this window's dense sums
    rbuf,  # (2, _ROWS, E) VMEM scratch: double-buffered entry chunks
    sems,  # (2,) DMA semaphores
    *,
    cols: int,
    precision=jax.lax.Precision.HIGHEST,
):
    w = pl.program_id(0)
    w_base = w * E
    start = ent_start_ref[w]
    end = ent_end_ref[w]
    # 128-aligned chunk origin (Mosaic lane alignment); head entries
    # belong to the previous window and are rejected by the id compare
    off0 = (start // _STRIP) * _STRIP
    n_chunks = jnp.where(end > off0, (end - off0 + E - 1) // E, 0)

    out_ref[...] = jnp.zeros((E, cols), jnp.float32)

    def chunk_dma(c):
        slot = jax.lax.rem(c, 2)
        off = pl.multiple_of(off0 + c * E, _STRIP)
        return pltpu.make_async_copy(
            rows_hbm.at[:, pl.ds(off, E)],
            rbuf.at[slot],
            sems.at[slot],
        )

    @pl.when(n_chunks > 0)
    def _():
        chunk_dma(0).start()

    def body(c, _):
        @pl.when(c + 1 < n_chunks)
        def _():
            chunk_dma(c + 1).start()

        chunk_dma(c).wait()
        cur = rbuf[jax.lax.rem(c, 2)]  # (_ROWS, E)
        ids = cur[cols : cols + 1, :]  # (1, E) f32 (exact for ids < 2^24)
        data = cur[0:cols, :]  # (cols, E)

        # strip range actually touched by this chunk's ids
        id_lo = cur[cols, 0]
        id_hi = cur[cols, E - 1]
        s_lo = jnp.clip(
            (id_lo - w_base).astype(jnp.int32) // _STRIP, 0, E // _STRIP
        )
        s_hi = jnp.clip(
            (id_hi - w_base).astype(jnp.int32) // _STRIP + 1, s_lo, E // _STRIP
        )

        def strip(s, _):
            base = s * _STRIP
            strip_ids = (
                jax.lax.broadcasted_iota(jnp.int32, (_STRIP, 1), 0)
                + (w_base + base)
            ).astype(jnp.float32)
            sel = (strip_ids == ids).astype(jnp.float32)  # (STRIP, E)
            part = jax.lax.dot_general(
                sel,
                data,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                # sel is exact 0/1; with f32 data HIGHEST is required or
                # the MXU rounds the gradient operand toward bf16 (~2^-9
                # relative error). When the data rows are already exactly
                # bf16-representable (dtype="bf16" reductions) the caller
                # passes DEFAULT: a single bf16 MXU pass is then exact.
                precision=precision,
            )  # (STRIP, cols)
            out_ref[pl.ds(base, _STRIP), :] += part
            return 0

        jax.lax.fori_loop(s_lo, s_hi, strip, 0, unroll=False)
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0, unroll=False)


def _segsum_kernel_packed(
    ent_start_ref,  # (n_windows,) int32 prefetch: first entry of window
    ent_end_ref,  # (n_windows,) int32 prefetch: one-past-last entry
    rows_hbm,  # (kpack+pad, L_pad) int32: [0:kpack] bf16-pair rows,
    #            [kpack] the id itself as int32
    out_ref,  # (E, 2*kpack) VMEM block: this window's dense sums,
    #           column layout [hi0..hi_{k-1}, lo0..lo_{k-1}]
    rbuf,  # (2, rows, E) VMEM scratch: double-buffered entry chunks
    sems,  # (2,) DMA semaphores
    *,
    kpack: int,
):
    """bf16-packed variant of :func:`_segsum_kernel`: streams HALF the
    bytes of the 16-row f32 table (the bf16 reduction's rows are already
    exactly bf16, so nothing is lost), unpacks in-VMEM with two int32
    shifts + a 32-bit bitcast (a bf16 value in the TOP half of an int32
    IS that f32 value — no 16-bit ops needed), and contracts the one-hot
    strips as single-pass bf16 MXU matmuls instead of the f32 table's
    multi-pass HIGHEST dots. Round-4 addition: the f32-table path made
    reduce_bwd the largest backward stage (223.7 ms at the 6M north-star
    config, BASELINE.md round 4)."""
    w = pl.program_id(0)
    w_base = w * E
    start = ent_start_ref[w]
    end = ent_end_ref[w]
    off0 = (start // _STRIP) * _STRIP
    n_chunks = jnp.where(end > off0, (end - off0 + E - 1) // E, 0)

    out_ref[...] = jnp.zeros((E, 2 * kpack), jnp.float32)

    def chunk_dma(c):
        slot = jax.lax.rem(c, 2)
        off = pl.multiple_of(off0 + c * E, _STRIP)
        return pltpu.make_async_copy(
            rows_hbm.at[:, pl.ds(off, E)],
            rbuf.at[slot],
            sems.at[slot],
        )

    @pl.when(n_chunks > 0)
    def _():
        chunk_dma(0).start()

    def body(c, _):
        @pl.when(c + 1 < n_chunks)
        def _():
            chunk_dma(c + 1).start()

        chunk_dma(c).wait()
        cur = rbuf[jax.lax.rem(c, 2)]  # (rows, E) int32
        ids = cur[kpack : kpack + 1, :]  # (1, E) int32
        packed = cur[0:kpack, :]
        # exact bf16-pair unpack, 32-bit ops only: top half in place ->
        # the even field's f32 value; low half shifted up -> the odd's
        hi = jax.lax.bitcast_convert_type(
            (packed >> 16) << 16, jnp.float32
        ).astype(jnp.bfloat16)
        lo = jax.lax.bitcast_convert_type(
            packed << 16, jnp.float32
        ).astype(jnp.bfloat16)
        data = jnp.concatenate([hi, lo], axis=0)  # (2*kpack, E) bf16

        id_lo = cur[kpack, 0]
        id_hi = cur[kpack, E - 1]
        s_lo = jnp.clip((id_lo - w_base) // _STRIP, 0, E // _STRIP)
        s_hi = jnp.clip((id_hi - w_base) // _STRIP + 1, s_lo, E // _STRIP)

        def strip(s, _):
            base = s * _STRIP
            strip_ids = jax.lax.broadcasted_iota(
                jnp.int32, (_STRIP, 1), 0
            ) + (w_base + base)
            sel = (strip_ids == ids).astype(jnp.bfloat16)  # (STRIP, E)
            # sel is exact {0, 1} bf16 and data is exact bf16: ONE MXU
            # pass accumulates exactly into the f32 accumulator
            part = jax.lax.dot_general(
                sel,
                data,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (STRIP, 2*kpack)
            out_ref[pl.ds(base, _STRIP), :] += part
            return 0

        jax.lax.fori_loop(s_lo, s_hi, strip, 0, unroll=False)
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0, unroll=False)


def _segsum_call_packed(sorted_key, packed_cols, keep, n_out: int,
                        cols: int, interpret: bool):
    """Segment-sum bf16-pair-packed rows by sorted id.

    Args:
      sorted_key: (L,) int32 ascending; >= n_out rows are dropped.
      packed_cols: kpack-sequence of (L,) int32 bf16 pairs (hi = even
        field, lo = odd field), in sorted order.
      keep: (L,) bool, False rows are zeroed (their packed values may be
        garbage, e.g. unwritten backward-kernel columns).

    Returns (n_out, cols) f32 sums in field order.
    """
    kpack = len(packed_cols)
    L = sorted_key.shape[0]
    n_windows = max(1, -(-n_out // E))
    outside = jnp.int32(n_windows * E)
    ids_i = jnp.where(keep, sorted_key, outside)
    zeroed = [jnp.where(keep, c, 0) for c in packed_cols]
    # sublane-pad the row count to a multiple of 8 (CLAUDE.md rules)
    rows = kpack + 1
    rows_pad = -(-rows // 8) * 8
    pad = jnp.zeros((rows_pad - rows, L), jnp.int32)
    table = jnp.concatenate(
        [jnp.stack(zeroed, axis=0), ids_i[None, :], pad], axis=0
    )
    tail = jnp.zeros((rows_pad, E), jnp.int32).at[kpack, :].set(outside)
    table = jnp.concatenate([table, tail], axis=1)

    bounds = jnp.arange(n_windows + 1, dtype=jnp.int32) * E
    cuts = jnp.searchsorted(sorted_key, bounds, side="left").astype(jnp.int32)
    ent_start, ent_end = cuts[:-1], cuts[1:]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_windows,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (E, 2 * kpack), lambda w, *_: (w, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, rows_pad, E), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_segsum_kernel_packed, kpack=kpack),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_windows * E, 2 * kpack), jnp.float32
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(ent_start, ent_end, table)
    # kernel column layout [hi0..hi_{k-1}, lo0..lo_{k-1}] -> field order
    order = [(f // 2) + (f % 2) * kpack for f in range(cols)]
    return out[:n_out, jnp.asarray(order, jnp.int32)]


def segment_sum_sorted(
    sorted_gid, sorted_rows, n_out: int, interpret: bool = False
):
    """Sum `sorted_rows` per id.

    Args:
      sorted_gid: (L,) int32, ascending, in [0, 2^24). Ids >= n_out are a
        drop-bin for padding rows.
      sorted_rows: (L, COLS) float32 with COLS < 16.
      n_out: number of output rows.

    Returns:
      (n_out, COLS) float32: out[g] = sum of rows with gid == g (zeros
      for ids with no entries).
    """
    L, cols = sorted_rows.shape
    if cols >= _ROWS:
        raise ValueError(f"COLS={cols} must be < {_ROWS}")
    n_windows = max(1, -(-n_out // E))
    outside = jnp.float32(n_windows * E)  # excluded from every window

    ids_f = jnp.where(
        sorted_gid < n_out, sorted_gid.astype(jnp.float32), outside
    )
    pad = jnp.zeros((_ROWS - cols - 1, L), jnp.float32)
    table = jnp.concatenate([sorted_rows.T, ids_f[None, :], pad], axis=0)
    # tail pad so any 128-aligned (16, E)-chunk read stays in bounds
    tail = jnp.zeros((_ROWS, E), jnp.float32).at[cols, :].set(outside)
    table = jnp.concatenate([table, tail], axis=1)  # (_ROWS, L + E)
    return _segsum_call(sorted_gid, table, n_out, cols, interpret)


def _segsum_call(sorted_gid, table, n_out: int, cols: int, interpret: bool,
                 precision=jax.lax.Precision.HIGHEST):
    """Invoke the window kernel on a prebuilt (_ROWS, L + E) table."""
    n_windows = max(1, -(-n_out // E))
    bounds = jnp.arange(n_windows + 1, dtype=jnp.int32) * E
    cuts = jnp.searchsorted(sorted_gid, bounds, side="left").astype(jnp.int32)
    ent_start, ent_end = cuts[:-1], cuts[1:]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_windows,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (E, cols), lambda w, *_: (w, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, _ROWS, E), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_segsum_kernel, cols=cols, precision=precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_windows * E, cols), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(ent_start, ent_end, table)
    return out[:n_out]


def reduce_rows_by_id(gid, rows, n_out: int, interpret: bool = False):
    """Unsorted segment-sum: sort rows by id, then segment_sum_sorted.

    Args:
      gid: (L,) int32 in [-1, n_out); -1 rows are dropped.
      rows: (L, COLS) float32.

    Returns (n_out, COLS) float32 sums.
    """
    L, cols = rows.shape
    key = jnp.where(gid >= 0, gid, n_out)
    # argsort (cheap: 8-byte pairs), then one row gather of the payload.
    # (key, iota) is unique, so 2-key unstable == 1-key stable but runs
    # lax.sort's cheaper unstable network.
    iota = jnp.arange(L, dtype=jnp.int32)
    sorted_key, perm = jax.lax.sort((key, iota), num_keys=2, is_stable=False)
    # dropped rows may hold garbage (e.g. unwritten backward-kernel
    # columns); zero them or 0 * NaN would poison the one-hot matmul
    keep = sorted_key < n_out
    sorted_rows = jnp.where(
        keep[:, None], jnp.take(rows, perm, axis=0), 0.0
    )
    return segment_sum_sorted(sorted_key, sorted_rows, n_out, interpret)


def _pack_bf16_pairs(rows):
    """9ish f32 rows -> ceil(n/2) uint32 rows of packed bf16 pairs."""
    def b16(x):
        return jax.lax.bitcast_convert_type(
            x.astype(jnp.bfloat16), jnp.uint16
        ).astype(jnp.uint32)

    out = []
    for i in range(0, len(rows), 2):
        hi = b16(rows[i])
        lo = b16(rows[i + 1]) if i + 1 < len(rows) else jnp.zeros_like(hi)
        out.append((hi << 16) | lo)
    return out


def pack_rows_bf16(rows):
    """(M, 2k or 2k-1) f32 matrix -> (M, k) int32 bf16 pairs, row-space
    (hi = even columns, lo = odd; odd widths zero-pad the last lo)."""
    cols = rows.shape[1]
    if cols % 2:
        rows = jnp.concatenate(
            [rows, jnp.zeros((rows.shape[0], 1), rows.dtype)], axis=1
        )

    def u(x):
        return jax.lax.bitcast_convert_type(
            x.astype(jnp.bfloat16), jnp.uint16
        ).astype(jnp.int32)

    return (u(rows[:, 0::2]) << 16) | u(rows[:, 1::2])


def unpack_rows_bf16(packed, cols: int):
    """(M, k) int32 -> (M, cols) f32, inverse of pack_rows_bf16.
    Row-space throughout — one interleave, no per-column slicing (the
    9x-relayout trap, ops/render._unpack_rows7)."""
    hi = jax.lax.bitcast_convert_type(
        (packed >> 16).astype(jnp.uint16), jnp.bfloat16
    ).astype(jnp.float32)
    lo = jax.lax.bitcast_convert_type(
        packed.astype(jnp.uint16), jnp.bfloat16
    ).astype(jnp.float32)
    m = packed.shape[0]
    return jnp.stack([hi, lo], axis=-1).reshape(m, -1)[:, :cols]


def reduce_fields_by_id(
    gid, field_rows, n_out: int, interpret: bool = False, dtype: str = "f32",
    method: str = "ride", stable: bool = False,
):
    """Like reduce_rows_by_id but for field-major input.

    Args:
      gid: (L,) int32 in [-1, n_out); -1 rows are dropped.
      field_rows: COLS-sequence of (L,) float32 (e.g. payload-gradient
        rows straight off the backward kernel's field-major output).
      dtype: "f32" (exact) or "bf16" — per-entry rows round to bf16
        (packed in pairs) before the sort-side movement, cutting the
        dominant bytes ~40%. The ~2^-9 relative per-entry rounding is
        far below SGD gradient noise; the per-gaussian sums stay f32.
      method:
        "rowgather" — sort only (key, iota) (unique composite => fully
          deterministic even unstable), then move the field rows with a
          SINGLE row gather of the (L, cols)-packed matrix. Row gathers
          are ~per-row-cost on TPU, so this can beat hauling every
          field row through the sort's merge passes (see BASELINE.md
          round 3 for the measured comparison).
        "ride" — the COLS rows ride the sort as extra lax.sort operands
          (no gather, no (L, cols) re-layout); cheaper only for few
          columns.
      stable: sort stability. A segment-sum is invariant to the order of
        entries within a segment up to float-summation association, so
        the default production path uses stable=False (lax.sort's
        unstable mode runs ~2x fewer merge bytes, BASELINE.md round 3);
        stable=True reproduces a fixed intra-segment order for
        bit-exactness comparisons.

    Returns (n_out, COLS) float32 sums.
    """
    cols = len(field_rows)
    L = gid.shape[0]
    key = jnp.where(gid >= 0, gid, n_out)
    if method == "rowgather":
        # (key, iota) is a unique composite: 2-key unstable == 1-key
        # stable, at unstable-sort cost
        iota = jnp.arange(L, dtype=jnp.int32)
        sorted_key, perm = jax.lax.sort(
            (key, iota), num_keys=2, is_stable=False
        )
        # ALL post-gather work stays in gather-row (L, k) space with ONE
        # wholesale transpose at the end: slicing per-field (L,) columns
        # out of the gathered rows and re-stacking them field-major makes
        # XLA rematerialize a full transpose+copy per field (the 9x
        # relayout measured on the payload-gather path, ops/render.py
        # _unpack_rows7).
        if dtype == "bf16":
            # packed end to end: gather the bf16-pair int32 rows and
            # feed them STILL PACKED to the packed segsum kernel, which
            # unpacks in VMEM — skips the round-4-measured f32 blowup
            # (the (L, cols) unpack + transpose + 16-row f32 table cost
            # more HBM traffic than the reduction itself)
            packed = _pack_bf16_pairs(field_rows)
            mat = jnp.stack(packed, axis=1)  # (L, ceil(cols/2)) uint32
            sp = jnp.take(mat.astype(jnp.int32), perm, axis=0)
            keep = sorted_key < n_out
            return _segsum_call_packed(
                sorted_key, [sp[:, i] for i in range(sp.shape[1])],
                keep, n_out, cols, interpret,
            )
        elif dtype == "f32":
            mat = jnp.stack(field_rows, axis=1)  # (L, cols)
            rows_lc = jnp.take(mat, perm, axis=0)
        else:
            raise ValueError(f"unknown reduce dtype {dtype!r}")
        keep = sorted_key < n_out
        n_windows = max(1, -(-n_out // E))
        outside = jnp.float32(n_windows * E)
        ids_f = jnp.where(keep, sorted_key.astype(jnp.float32), outside)
        zeroed_cl = jnp.where(keep[:, None], rows_lc, 0.0).T  # (cols, L)
        pad = jnp.zeros((_ROWS - cols - 1, L), jnp.float32)
        table = jnp.concatenate([zeroed_cl, ids_f[None, :], pad], axis=0)
        tail = jnp.zeros((_ROWS, E), jnp.float32).at[cols, :].set(outside)
        table = jnp.concatenate([table, tail], axis=1)
        precision = (
            jax.lax.Precision.DEFAULT
            if dtype == "bf16"
            else jax.lax.Precision.HIGHEST
        )
        return _segsum_call(
            sorted_key, table, n_out, cols, interpret, precision
        )
    elif method == "ride":
        if dtype == "bf16":
            packed = _pack_bf16_pairs(field_rows)
            sorted_all = jax.lax.sort(
                (key, *packed), num_keys=1, is_stable=stable
            )
            sorted_key = sorted_all[0]
            keep = sorted_key < n_out
            return _segsum_call_packed(
                sorted_key,
                [c.astype(jnp.int32) for c in sorted_all[1:]],
                keep, n_out, cols, interpret,
            )
        elif dtype == "f32":
            sorted_all = jax.lax.sort(
                (key, *field_rows), num_keys=1, is_stable=stable
            )
            sorted_key, sorted_fields = sorted_all[0], sorted_all[1:]
        else:
            raise ValueError(f"unknown reduce dtype {dtype!r}")
    else:
        raise ValueError(f"unknown reduce method {method!r}")
    keep = sorted_key < n_out

    n_windows = max(1, -(-n_out // E))
    outside = jnp.float32(n_windows * E)
    ids_f = jnp.where(keep, sorted_key.astype(jnp.float32), outside)
    pad = jnp.zeros((_ROWS - cols - 1, L), jnp.float32)
    zeroed = [jnp.where(keep, f, 0.0) for f in sorted_fields]
    table = jnp.concatenate(
        [jnp.stack(zeroed, axis=0), ids_f[None, :], pad], axis=0
    )
    tail = jnp.zeros((_ROWS, E), jnp.float32).at[cols, :].set(outside)
    table = jnp.concatenate([table, tail], axis=1)
    # bf16-exact data: a single DEFAULT-precision MXU pass loses nothing
    precision = (
        jax.lax.Precision.DEFAULT
        if dtype == "bf16"
        else jax.lax.Precision.HIGHEST
    )
    return _segsum_call(
        sorted_key, table, n_out, cols, interpret, precision
    )
