"""Pallas 1-D inclusive scan (cummax): one-HBM-pass log-shift scan.

Blocks are staged into VMEM, scanned with log-shift max along lanes plus
a sublane prefix, and a running carry threads through the sequential grid
in SMEM.

Measured note (v5e): at the binning pipeline's sizes (4-13M int32),
XLA's own lax.cummax is marginally FASTER than this kernel (its log-depth
passes pipeline well, and the sequential grid here serializes); the
binning forward-fill therefore keeps lax.cummax, whose real cost is the
preceding scatter anyway. Kept as validated infrastructure: the pattern
(sequential carry + roll-based scans) is the building block for scans
XLA does poorly (segmented scans, tuple carries).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 1024  # lanes per staged row
_ROWS = 64  # rows per grid step
_BLOCK = _ROWS * _LANES
_MIN = jnp.iinfo(jnp.int32).min


def _cummax_kernel(x_ref, o_ref, carry):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        carry[0] = _MIN

    x = x_ref[...]  # (_ROWS, _LANES) int32, row-major flat order

    # inclusive scan along lanes (log shifts; rolled-in lanes masked off)
    lane = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, _LANES), 1)
    k = 1
    while k < _LANES:
        shifted = pltpu.roll(x, k, axis=1)
        x = jnp.maximum(x, jnp.where(lane >= k, shifted, _MIN))
        k *= 2

    # exclusive prefix over row totals (scan along sublanes)
    row_last = x[:, _LANES - 1 : _LANES]  # (_ROWS, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, 1), 0)
    p = row_last
    k = 1
    while k < _ROWS:
        shifted = pltpu.roll(p, k, axis=0)
        p = jnp.maximum(p, jnp.where(row >= k, shifted, _MIN))
        k *= 2
    # shift down one row for the exclusive form, seed with the carry
    excl = jnp.where(row >= 1, pltpu.roll(p, 1, axis=0), _MIN)
    excl = jnp.maximum(excl, carry[0])

    x = jnp.maximum(x, excl)
    carry[0] = x[_ROWS - 1, _LANES - 1]
    o_ref[...] = x


def cummax_i32(x, interpret: bool = False):
    """Inclusive cummax of a 1-D int32 array, one HBM pass."""
    (n,) = x.shape
    pad = (-n) % _BLOCK
    if pad:
        x = jnp.concatenate([x, jnp.full((pad,), _MIN, jnp.int32)])
    rows = (n + pad) // _LANES
    out = pl.pallas_call(
        _cummax_kernel,
        grid=(rows // _ROWS,),
        in_specs=[
            pl.BlockSpec(
                (_ROWS, _LANES), lambda b: (b, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (_ROWS, _LANES), lambda b: (b, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows, _LANES), jnp.int32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),  # sequential: carry chain
        ),
        interpret=interpret,
    )(x.reshape(rows, _LANES))
    return out.reshape(-1)[:n]


def cummax(x):
    """Dispatch: Pallas on TPU, lax.cummax elsewhere/interpret."""
    if x.dtype == jnp.int32 and jax.default_backend() == "tpu":
        return cummax_i32(x)
    return jax.lax.cummax(x)
