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


def _unpack_bf16_pairs(packed, n: int):
    def f32(u16):
        return jax.lax.bitcast_convert_type(
            u16.astype(jnp.uint16), jnp.bfloat16
        ).astype(jnp.float32)

    rows = []
    for p in packed:
        rows.append(f32(p >> 16))
        if len(rows) < n:
            rows.append(f32(p & 0xFFFF))
    return rows[:n]


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
            packed = _pack_bf16_pairs(field_rows)
            mat = jnp.stack(packed, axis=1)  # (L, ceil(cols/2)) uint32
            sp = jnp.take(mat, perm, axis=0)
            rows_lc = unpack_rows_bf16(sp, cols)  # (L, cols)
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
            sorted_fields = _unpack_bf16_pairs(sorted_all[1:], cols)
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
