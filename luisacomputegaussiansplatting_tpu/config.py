"""Render configuration and pipeline constants.

The numeric constants reproduce the reference renderer's behaviour
(values documented in /root/reference, cited per field) so that images are
comparable; everything else (capacities, padding) is TPU-static-shape design.
"""

from __future__ import annotations

import dataclasses

# Tile edge in pixels. One rasterizer grid step covers one TILE x TILE tile.
# Reference: lcgs/include/lcgs/module.h:17 (block 16x16).
TILE = 16

# Gaussians processed per rasterizer chunk (sublane-dim of the blend matmul).
CHUNK = 128


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static configuration of the splatting pipeline.

    All fields are Python ints/floats (static under jit); changing any of
    them triggers recompilation, mirroring how the reference bakes them into
    its JIT-compiled shaders.
    """

    # --- image-independent pipeline constants (reference parity) ---
    #: near-plane cull: gaussians with view-space z below this are dropped.
    #: Reference: lcgs/src/gs_projector/shader.cpp:121.
    near: float = 0.2
    #: low-pass filter added to the 2D covariance diagonal.
    #: Reference: lcgs/src/gs_tile_splatter/shader.cpp:139-140.
    lowpass: float = 0.3
    #: splat radius in standard deviations: radius = ceil(k * sqrt(lambda_max)).
    #: Reference: gs_tile_splatter/shader.cpp:148 (k = 3).
    radius_sigma: float = 3.0
    #: alpha is clamped to at most this value.
    #: Reference: gs_tile_splatter/shader.cpp:259.
    alpha_max: float = 0.99
    #: contributions with alpha below this are skipped.
    #: Reference: gs_tile_splatter/shader.cpp:260 (1/255).
    alpha_min: float = 1.0 / 255.0
    #: blending stops once transmittance would drop below this.
    #: Reference: gs_tile_splatter/shader.cpp:262 (1e-4).
    transmittance_eps: float = 1e-4
    #: frustum clamp factor for the EWA Jacobian linearisation point.
    #: Reference: gs_projector/shader.cpp:150-151 (1.3 * tanfov).
    frustum_clamp: float = 1.3
    #: epsilon added to the homogeneous w before division.
    #: Reference: gs_projector/shader.cpp:116 (1e-6).
    w_eps: float = 1e-6
    #: epsilon added to the 2D covariance determinant before inversion.
    #: Reference: gs_tile_splatter/shader.cpp:143 (1e-6).
    det_eps: float = 1e-6
    #: znear / zfar of the projection matrix (only affects NDC z, unused by
    #: the splatting math). Reference: lcgs/include/lcgs/util/camera.h:54.
    znear: float = 0.1
    zfar: float = 100.0

    #: EWA Jacobian variant. True (reference default, gs_projector.h:42)
    #: projects the covariance straight to pixel units with focal-scaled
    #: J (gaussian.hpp:52-70). False reproduces shad_project_gs
    #: (gs_projector/shader.cpp:18-80): unit-focal J, rescaled to NDC
    #: units by 1/tanfov^2 in the projector, then to pixel units by
    #: res^2/4 in allocate_tiles (gs_tile_splatter/shader.cpp:132-138) —
    #: including the reference's cov.z factor of H*W/4 (not H^2/4), which
    #: makes the two paths differ by W/H on that term for non-square
    #: images.
    use_focal: bool = True

    #: rasterizer tile edge in pixels. 16 reproduces the reference's
    #: binning semantics exactly (module.h:17); 32 roughly halves the
    #: binning/sort work for scenes of small splats at slightly more
    #: blend compute, with tiny image differences at tile borders (a
    #: gaussian's 3-sigma rect rounds to different pixel sets).
    tile: int = 16

    #: optional tile HEIGHT (None = square tile x tile). Rectangular
    #: tiles (e.g. 32 x 16) trade more binning entries for fewer pixels
    #: blended per entry: the VPU-bound rasterizer kernels scale with
    #: entries x pixels-per-tile, the entry-side stages with entries —
    #: at bicycle scale 32x16 beats both squares. tile * tile_h must be
    #: a multiple of 8 (Mosaic sublane alignment of per-tile outputs).
    tile_h: int | None = None

    #: tile-rect clamp convention. "lcgs" clamps the *exclusive* max tile
    #: index to grid-1 (reference lcgs/src/module.cpp:33-35, which never bins
    #: into the last tile row/column); "inria" clamps to grid like the
    #: original graphdeco CUDA rasterizer (the BASELINE.json validation
    #: oracle), which is the default.
    rect_mode: str = "inria"

    # --- capacities (static shapes; TPU replacement for the reference's
    # dynamic num_rendered readback, app/main.cpp:245 uses L = 20'000'000) ---
    #: maximum number of (tile, depth) pairs before per-tile chunk padding.
    max_pairs: int = 2_000_000

    #: optional smaller static capacity for the POST-sort entry stream
    #: (None = max_pairs). With tile_cull on, culled slots sort last, so
    #: the payload gather / rasterizer / backward reduction can run at
    #: the post-cull size while expansion still covers the full AABB
    #: count. Truncating a valid entry raises the overflow flag.
    max_pairs_sorted: int | None = None

    #: exact ellipse-tile culling during binning: drop AABB entries whose
    #: tile cannot receive any alpha >= 1/255 contribution (closed-form
    #: minimum of the conic quadratic over the tile). Output exact up to
    #: float summation regrouping. With expansion="auto"/"pallas" the
    #: test runs INSIDE the fused expansion kernel for ~free and shrinks
    #: every per-tile rasterizer range 20-30% — recommended for perf
    #: configs (bench.py uses it). The XLA-expansion fallback pays a
    #: per-slot post-pass that measured net-negative on v5e, so the
    #: default stays False (also keeps strict reference binning counts).
    tile_cull: bool = False

    #: splat-entry layout for the rasterizer. "chunk" (reference-faithful
    #: packing): every tile's sorted range is repacked to CHUNK-aligned
    #: offsets. "none": kernels read the raw sorted stream at 128-aligned
    #: over-read offsets and mask entries outside each tile's range by
    #: global index — no repacking pass, no slot remap gather, ~10% less
    #: end-to-end work (backward then uses read-modify-write on boundary
    #: chunks under a sequential grid).
    pack_mode: str = "chunk"

    # --- kernel switches ---
    #: use the Pallas rasterizer ("pallas") or the pure-jnp reference
    #: rasterizer ("jnp", only viable for tiny scenes).
    rasterizer: str = "pallas"
    #: tile-rect expansion: "auto" (Pallas fused kernel when applicable,
    #: see ops/expand_pallas.py), "pallas" (force), "xla" (scatter +
    #: cummax + gather path — required for >2^24 pairs).
    expansion: str = "auto"

    #: per-entry gradient precision through the backward reduction sort:
    #: "f32" (bit-exact reduction) or "bf16" (rows ride the sort packed
    #: in bf16 pairs — 40% fewer bytes through the dominant backward
    #: sort; ~2^-9 relative per-entry rounding, far below SGD gradient
    #: noise; per-gaussian sums stay f32).
    grad_reduce_dtype: str = "f32"
    #: how the per-entry gradient rows travel to the reduction kernel:
    #: "ride" (rows ride the reduce sort as lax.sort operands) or
    #: "rowgather" (sort only (gid, iota) — a 2-operand unstable sort —
    #: then move all rows in ONE packed row gather at the sorted
    #: positions). lax.sort cost grows super-linearly in operand count
    #: on TPU while row gathers cost ~per row, so rowgather wins when
    #: cols is large; results identical up to intra-segment float
    #: association (see ops.segsum.reduce_fields_by_id).
    grad_reduce_method: str = "ride"
    #: shrink each splat's pixel radius from the fixed radius_sigma
    #: (reference 3 sigma, shader.cpp:139-148) to the exact alpha_min
    #: reach sqrt(2 ln(opacity/alpha_min)) sigma (clamped to
    #: radius_sigma). Images identical up to float reduction order (the
    #: blend kernel skips alpha < alpha_min contributions anyway,
    #: shader.cpp:257-266; removing them regroups chunked prefix sums);
    #: low-opacity splats just stop occupying expansion slots for tiles
    #: they cannot touch. Changes RenderAux.radii values (densify
    #: screen-size stats see the tight radius).
    tight_radius: bool = False
    #: entry-sort key layout: "2key" (stable (tile, f32-depth) sort —
    #: exact reference tie-break parity, shader.cpp:59-62) or "fused"
    #: (single quantized uint32 key, ~3.5x cheaper sort; blend order
    #: differs only between depths colliding within ~2^-13 relative at
    #: 1080p. See ops.binning._sort_entries).
    sort_mode: str = "2key"
    #: per-entry payload precision through the capacity-axis row gather:
    #: "f32" (exact, 9 f32 columns) or "bf16" (opacity+rgb ride the
    #: gather as bf16 pairs, shrinking the row to 7 int32 columns —
    #: measured ~2x cheaper on v5e, where <=8-column rows gather at
    #: ~7 ns/row vs ~15 ns for 9 columns; mean/conic stay f32). The
    #: ~2^-9 relative rounding on opacity/colour is below the 1/255
    #: output quantisation; gradients are computed at the rounded
    #: values and reduced in f32 (or grad_reduce_dtype).
    payload_dtype: str = "f32"

    #: where the blend kernels evaluate the per-pair conic quadratic
    #: (power, gs_tile_splatter/shader.cpp:249-256): "vpu"
    #: (reference-exact elementwise math) or "mxu" (the (pix, 8)
    #: tile-local pixel polynomial basis [1, x, y, x^2, y^2, xy]
    #: contracts against per-entry quadratic coefficients on the MXU —
    #: one matmul replaces ~12 VPU ops/pair in BOTH blend kernels, the
    #: same basis trick the backward already uses for its moment
    #: contraction; the forward's colour accumulation rides a second
    #: matmul). ln(opacity) is folded into the constant coefficient so
    #: alpha = exp(power'). Tile-local coordinates keep the basis terms
    #: small (in-tile entries bound ca*mxl^2 by ~2 ln(op/alpha_min), so
    #: the f32 HIGHEST contraction's |power| error is ~1e-6; global
    #: coords would cancel catastrophically). The reference's power > 0
    #: skip becomes power > POWER_GUARD (1e-3): a near-boundary
    #: contribution is kept (alpha <= op*e^1e-3, still alpha_max-
    #: clamped) rather than dropped, and alpha_min-threshold flips move
    #: only contributions below the 1/255 output quantisation.
    #: Strict-parity configs keep "vpu".
    blend_quad: str = "vpu"

    #: force Pallas interpret mode (automatic on non-TPU backends).
    interpret: bool | None = None

    @property
    def tile_wh(self) -> tuple:
        """(tile width, tile height) in pixels."""
        return self.tile, self.tile_h if self.tile_h else self.tile

    def pairs_capacity(self, num_tiles: int) -> int:
        """Total padded entry capacity: every tile's range is padded to a
        multiple of CHUNK so rasterizer chunks never straddle tiles."""
        return self.max_pairs + num_tiles * CHUNK
