"""Tile binning: splat -> (tile, depth)-sorted intersection lists (pure XLA).

TPU-native replacement for the CUDA radix-sort binning hidden inside
``gsplat.rasterize_gaussians`` (map-gaussians-to-intersects + sort by
(tile_id, depth) + tile bin edges; see SURVEY.md section 2.2, reference call
site /root/reference/tinysplat/splatting/rasterize.py:44). There are no
atomics or dynamic allocations on TPU, so the classic pipeline is recast with
static shapes, and — because XLA:TPU's gather/scatter emitter costs ~10 ns
per index regardless of row width — with scans instead of per-entry gathers:

1. Each splat covers a rectangle of 16x16 tiles (AABB of its 3-sigma radius,
   projection.tile_ranges). Splats are depth-presorted (N-sized argsort), so
   duplicates are *generated* front-to-back and one single-key stable sort
   finishes the ordering.
2. A two-level expansion maps splats -> row spans -> (tile, splat) entries:
   the inverse maps are scatter + cummax fills, per-entry tile ids come from
   a delta-cumsum (+1 inside a span, jump at span starts), and depth ranks
   from a monotone cummax fill — zero per-entry gathers
   (_sorted_intersections docstring has the details).
3. One ``jax.lax.sort`` by tile id (stable; entries already depth-ordered)
   orders every tile's intersections front-to-back; depth-rank order breaks
   ties deterministically (sharding-invariant, SURVEY.md section 7
   'sorted-order determinism').
4. The sorted entry list is consumed in one of two layouts: DenseBins — the
   sort output itself, unpadded, with per-tile [start, count) ranges (the
   Pallas kernels walk ranges with their own DMA windows) — or scattered
   into a dense (num_tiles, max_per_tile) index table (TileBins, the XLA
   fallback rasterizer). Overflowing tiles keep their *nearest*
   max_per_tile splats (entries arrive depth-sorted).

All capacity knobs are static; overflow is reported as device scalars so the
caller can grow them (one recompile, same pattern as splat-capacity growth).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .projection import tile_ranges
from .rasterize_dense import ALPHA_EPS

# f32 integers are exact below 2^24: above this span capacity the span-start
# column cannot ride the packed f32 gather and an exact int32 side gather
# runs instead (see _sorted_intersections level 1). Module-level so tests
# can lower it to exercise the fallback without 16M-span arrays.
SPAN_START_PACK_LIMIT = 1 << 24


class DenseBins(NamedTuple):
    """UNPADDED (tile, depth)-sorted intersection layout (round-3 design).

    Entries are exactly the stable-sort output laid out densely: tile t's
    depth-sorted entries occupy ``[tile_starts[t], tile_starts[t] +
    full_counts[t])`` with NO per-tile chunk alignment — the Pallas kernels
    walk each tile's (arbitrary-offset) range with their own chunked DMA
    loops, so the ~40% per-tile ceil-to-chunk padding of the old FlatBins
    layout disappears from every entry-indexed cost at once: the attribute
    gather, the gradient reduction, both kernel grids, and this structure's
    own build (the aligned-position scatter is gone — the sort IS the
    layout). One trailing all-pad chunk keeps dynamic-slice DMA windows
    ``[start + k*chunk, +chunk)`` in bounds (a clamped window start would
    silently shift the window).
    """

    entry_rank: jax.Array  # (dup_capacity + chunk,) int32 DEPTH RANKS, -1 pad
    order: jax.Array  # (N,) depth sort: original id = order[rank]
    tile_starts: jax.Array  # (num_tiles,) int32 segment start per tile
    counts: jax.Array  # (num_tiles,) int32 clamped to max_per_tile
    num_entries: jax.Array  # () int32 kept entries (<= dup_capacity)
    total_intersections: jax.Array  # () int32 before clamping
    dup_overflow: jax.Array  # () int32
    tile_overflow: jax.Array  # () int32


class TileBins(NamedTuple):
    """Per-tile splat index lists in front-to-back depth order."""

    idx_lists: jax.Array  # (num_tiles, max_per_tile) int32 splat ids, -1 pad
    counts: jax.Array  # (num_tiles,) int32 clamped to max_per_tile
    # Diagnostics (device scalars; fetch asynchronously):
    total_intersections: jax.Array  # () int32 before any clamping
    dup_overflow: jax.Array  # () int32 intersections dropped by dup_capacity
    tile_overflow: jax.Array  # () int32 entries dropped by max_per_tile


def _sorted_intersections(
    xys: jax.Array,
    depths: jax.Array,
    radii: jax.Array,
    valid: jax.Array,
    tiles_x: int,
    tiles_y: int,
    tile_size: int,
    dup_capacity: int,
    span_capacity: int = 0,
    conics: Optional[jax.Array] = None,
    opacities: Optional[jax.Array] = None,
    row_stride: int = 1,
    row_offset=0,
    tile_size_x: int = 0,
):
    """Shared core: (tile, depth)-sorted intersection entries + tile ranges.

    Returns (sorted_tile, sorted_rank, within, tile_starts, full_counts,
    total, order, span_overflow). ``sorted_rank`` holds DEPTH RANKS (the
    splat's position in the depth sort); original splat ids are
    ``order[sorted_rank]``. Entries with tile id == num_tiles are padding.

    TPU cost shape: XLA's gather emitter costs ~10 ns/row regardless of
    width, so the pipeline is built from scans and scatters instead of
    per-entry gathers:

      1. depth-argsort the N splats (duplicates are then *generated* in
         depth order, so one single-key stable sort by tile finishes);
      2. expand each splat's tile rectangle into per-ROW spans (a scatter +
         two cummax fills at span granularity — span count ~= entries /
         mean rect width);
      3. expand spans into entries with *zero* per-entry gathers: the entry
         tile id is a cumsum of a delta array (tile ids increment by one
         inside a span; span starts carry the jump), and the entry depth
         rank is a cummax fill (ranks are non-decreasing across spans);
      4. stable sort by tile; within-tile ranks from run starts.

    Exact alpha-test ellipse culling (conics + opacities given): a splat's
    compositing is masked wherever ``opacity * exp(-sigma) < ALPHA_EPS``
    (rasterize_dense.alpha_matrix), i.e. everywhere outside the conic contour
    ``sigma(dx, dy) = t_s`` with ``t_s = log(opacity / ALPHA_EPS)``. Any
    (splat, tile) pair whose tile lies entirely outside that ellipse
    contributes exactly zero to the image AND the gradients, so it can be
    dropped from the worklist with bit-identical results. The per-splat tile
    rect (the circle AABB gsplat uses) is tightened to the ellipse's y-range,
    and each row span is clipped to the ellipse's x-extent over that row's
    pixel band (a closed-form max of a concave function — per-SPAN scalar
    work, zero extra per-entry cost). Trained scenes are dominated by
    anisotropic, partially transparent splats, for which the rect is 2-5x the
    ellipse — this cuts every downstream per-entry cost (attr gather, kernel
    grid, grad scatter, sorts) by the same factor.

    Strided tile-row banding (``row_stride`` S > 1, ``row_offset`` o — o may
    be a traced scalar, e.g. a mesh axis index): this invocation bins only
    the GLOBAL tile rows {o, o + S, o + 2S, ...} against a LOCAL grid of
    ``tiles_y`` rows (local row g <-> global row o + g*S). ``xys`` stay in
    GLOBAL pixel coordinates. Round-robining rows over the mesh 'tile' axis
    flattens the per-band intersection imbalance (measured 1.8x max/mean on
    contiguous bands, SCALING_r03.json) to group granularity. S == 1, o == 0
    is the plain single-device grid.
    """
    num_tiles = tiles_x * tiles_y
    n = xys.shape[0]
    if span_capacity <= 0:
        span_capacity = max(dup_capacity // 2, 2 * n)
    d1 = span_capacity
    d2 = dup_capacity
    tile_size_x = tile_size_x or tile_size  # width; tile_size is the height

    # Clamp rects against the GLOBAL row range; map to local rows below.
    bx0, bx1, by0, by1 = tile_ranges(
        xys, radii, tiles_x, tiles_y * row_stride, tile_size,
        tile_size_x=tile_size_x,
    )
    ts_f = jnp.float32(tile_size)  # tile HEIGHT (rows, bands)
    ts_x = jnp.float32(tile_size_x)  # tile WIDTH (x spans)
    strided = row_stride != 1
    off = jnp.asarray(row_offset, jnp.int32)

    clip = conics is not None and opacities is not None
    if clip:
        # The worklist structure is constant w.r.t. parameters (the CUDA
        # kernels' sorted index buffers are too) — keep autodiff out of it.
        conics = jax.lax.stop_gradient(conics)
        opacities = jax.lax.stop_gradient(opacities)
        xys = jax.lax.stop_gradient(xys)
        # Per-splat ellipse-clip constants (all exact w.r.t. the alpha test;
        # see docstring). conic = [A, B, C] = inverse 2D covariance;
        # sigma(d) = 0.5 (A dx^2 + C dy^2) + B dx dy <= t_s is the ellipse
        # A dx^2 + 2B dx dy + C dy^2 <= 2 t_s.
        A = jnp.maximum(conics[:, 0], 1e-12)
        B = conics[:, 1]
        C = jnp.maximum(conics[:, 2], 1e-12)
        op = opacities.reshape(-1).astype(jnp.float32)
        t_s = jnp.log(jnp.maximum(op, 1e-30) / ALPHA_EPS)
        det = jnp.maximum(A * C - B * B, 1e-20)
        t2 = 2.0 * jnp.maximum(t_s, 0.0)
        dymax = jnp.sqrt(t2 * A / det)  # ellipse y half-extent (pixels)
        dxg = jnp.sqrt(t2 * C / det)  # ellipse x half-extent (global max)
        # x-extent at given dy: f(dy) = p1*dy + inva*sqrt(k1*dy^2 + k2),
        # concave; its max over a dy-band is at dy* (if inside) or the ends.
        p1 = -B / A
        k1 = -det  # = B^2 - A C
        k2 = t2 * A
        inva = 1.0 / A
        dystar = -B * jnp.sqrt(t2 / (C * det))
        cx = xys[:, 0].astype(jnp.float32)
        cy = xys[:, 1].astype(jnp.float32)
        # Tighten the circle-AABB rect to the ellipse AABB (exact cull).
        bx0 = jnp.maximum(bx0, jnp.floor((cx - dxg) / ts_x).astype(jnp.int32))
        bx1 = jnp.minimum(bx1, jnp.floor((cx + dxg) / ts_x).astype(jnp.int32) + 1)
        by0 = jnp.maximum(by0, jnp.floor((cy - dymax) / ts_f).astype(jnp.int32))
        by1 = jnp.minimum(by1, jnp.floor((cy + dymax) / ts_f).astype(jnp.int32) + 1)
        alive = valid & (t_s > 0.0)
    else:
        alive = valid

    if strided:
        # Global tile rows [by0, by1) -> local strided rows [g0, g1): local
        # row g covers global row off + g*row_stride. ceil/floor divisions
        # via numpy floor-division semantics.
        g0 = -((off - by0) // row_stride)
        g1 = (by1 - 1 - off) // row_stride + 1
        by0 = jnp.clip(g0, 0, tiles_y)
        by1 = jnp.clip(g1, 0, tiles_y)

    widths = jnp.maximum(bx1 - bx0, 0)
    rows = jnp.where(alive & (widths > 0), jnp.maximum(by1 - by0, 0), 0)

    # Depth-presort (stable: splat index breaks ties -> the composited image
    # is deterministic and sharding-invariant).
    order = jnp.argsort(jnp.where(valid, depths, jnp.inf), stable=True)
    f32 = lambda x: x.astype(jnp.float32)
    cols = [f32(rows), f32(jnp.maximum(widths, 1)), f32(bx0), f32(by0)]
    if clip:
        cols += [cx, cy, p1, k1, k2, inva, dxg, dystar, dymax]
    # Small integers are exact in f32 (tile ids < 2^24); one matrix keeps the
    # span-level fetch a SINGLE row gather. Both this depth-order permute and
    # the span gather run on int16 bitcast views (2.3x+ faster; exact).
    packed_unord = jnp.stack(cols, axis=1)
    k0 = packed_unord.shape[1]
    pu16 = jax.lax.bitcast_convert_type(packed_unord, jnp.int16).reshape(n, 2 * k0)
    packed = jax.lax.bitcast_convert_type(
        pu16[order].reshape(n, k0, 2), jnp.float32
    )
    rows_o = packed[:, 0].astype(jnp.int32)

    # --- level 1: splats -> row spans -----------------------------------------
    ends1 = jnp.cumsum(rows_o)
    starts1 = ends1 - rows_o
    total_spans = ends1[-1]
    ranks = jnp.arange(n, dtype=jnp.int32)
    # starts1 is non-decreasing (cumsum boundaries): tell the scatter
    # emitter (sorted-index scatters measured ~1.6x faster on v5e).
    mark1 = jnp.zeros((d1,), jnp.int32).at[starts1].max(
        ranks, mode="drop", indices_are_sorted=True
    )
    span_rank = jax.lax.cummax(mark1)  # depth rank per span (monotone fill)
    # Each span's row-within-rect is its distance to the owning splat's first
    # span. That start position rides the EXISTING span gather as one more
    # packed column (gather cost is width-independent on XLA:TPU) instead of
    # a second d1-sized scatter + cummax fill (scatter cost is per-index).
    # f32 carries span indices exactly only below 2^24; at larger span
    # capacities (~4M+ splats) fall back to a separate exact int32 gather.
    # The limit is a module constant so tests can lower it and exercise the
    # fallback at small scale (tests/test_binning.py).
    start_in_packed = d1 < SPAN_START_PACK_LIMIT
    if start_in_packed:
        packed = jnp.concatenate(
            [packed, starts1.astype(jnp.float32)[:, None]], axis=1
        )
    # (D1, k) row gather at SPAN granularity only; span_rank is monotone
    # (cummax fill), so tell XLA the indices are sorted. The gather runs on
    # an int16 bitcast view: XLA:TPU's gather emitter is ~2.3x faster on
    # 16-bit rows (measured v5e), and bitcast pairs reconstruct the f32 row
    # EXACTLY (pure bit movement, no arithmetic).
    k = packed.shape[1]
    packed_i16 = jax.lax.bitcast_convert_type(packed, jnp.int16).reshape(n, 2 * k)
    sp_i16 = jnp.take(packed_i16, span_rank, axis=0, indices_are_sorted=True)
    sp = jax.lax.bitcast_convert_type(sp_i16.reshape(d1, k, 2), jnp.float32)
    sp_bx0 = sp[:, 2]
    if start_in_packed:  # f32 exact: span starts < d1 < 2^24
        starts_sp = sp[:, k - 1].astype(jnp.int32)
    else:  # huge-scene path: exact int32 gather of the span starts
        starts_sp = jnp.take(starts1, span_rank, axis=0,
                             indices_are_sorted=True)
    row_idx = jnp.arange(d1, dtype=jnp.int32) - starts_sp
    tile_row = sp[:, 3] + row_idx.astype(jnp.float32)
    if clip:
        s_cx, s_cy = sp[:, 4], sp[:, 5]
        s_p1, s_k1, s_k2, s_inva = sp[:, 6], sp[:, 7], sp[:, 8], sp[:, 9]
        s_dxg, s_dystar, s_dymax = sp[:, 10], sp[:, 11], sp[:, 12]
        # Pixel band of this tile row, relative to the splat center. The
        # ellipse lives in GLOBAL pixel space: map strided local rows back.
        row_g = tile_row
        if strided:
            row_g = tile_row * jnp.float32(row_stride) + off.astype(jnp.float32)
        dy0 = row_g * ts_f - s_cy
        dy1 = dy0 + (ts_f - 1.0)

        def f_of(dy):  # x half-extent of the ellipse at offset dy
            return s_p1 * dy + s_inva * jnp.sqrt(
                jnp.maximum(s_k1 * dy * dy + s_k2, 0.0)
            )

        def band_max(lo, hi):  # max of concave f over [lo, hi] (pre-clamped)
            lo_c = jnp.clip(lo, -s_dymax, s_dymax)
            hi_c = jnp.clip(hi, -s_dymax, s_dymax)
            inside = (s_dystar >= lo_c) & (s_dystar <= hi_c)
            return jnp.where(
                inside, s_dxg, jnp.maximum(f_of(lo_c), f_of(hi_c))
            )

        dx_hi = band_max(dy0, dy1)
        dx_lo = -band_max(-dy1, -dy0)  # min of x extent = -max of mirrored f
        x_last = sp_bx0 + sp[:, 1] - 1.0  # inclusive last tile of the rect
        tx0 = jnp.clip(jnp.floor((s_cx + dx_lo) / ts_x), sp_bx0, x_last)
        tx1 = jnp.clip(jnp.floor((s_cx + dx_hi) / ts_x), tx0, x_last)
        span_len = (tx1 - tx0 + 1.0).astype(jnp.int32)
        span_base = (tile_row * tiles_x + tx0).astype(jnp.int32)
    else:
        span_len = sp[:, 1].astype(jnp.int32)
        span_base = (tile_row * tiles_x + sp_bx0).astype(jnp.int32)
    span_valid = jnp.arange(d1) < jnp.minimum(total_spans, d1)
    span_len = jnp.where(span_valid, span_len, 0)
    span_overflow = jnp.maximum(total_spans - d1, 0).astype(jnp.int32)

    # --- level 2: spans -> entries, gather-free --------------------------------
    ends2 = jnp.cumsum(span_len)
    starts2 = ends2 - span_len
    total2 = ends2[-1]
    total = total2  # actual (clip-culled) intersections generated
    # Budget diagnostics in ENTRY units: overflowed spans never materialize,
    # so estimate their entries at the mean kept-span width (ceil). Feeding
    # a raw span COUNT into dup_dropped made the auto-tuner's growth target
    # undershoot by (mean_width - 1) entries per dropped span.
    kept_spans = jnp.minimum(total_spans, jnp.int32(d1))
    mean_w = jnp.where(
        kept_spans > 0, -(-total2 // jnp.maximum(kept_spans, 1)), 1)
    span_overflow = span_overflow * jnp.maximum(mean_w, 1)
    # Entry tile id via delta-cumsum: +1 inside a span; at each span start,
    # the jump from the previous span's last tile to this span's base.
    prev_end = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), (span_base + span_len - 1)[:-1]]
    )
    pos_ok = span_valid & (span_len > 0) & (starts2 < d2)
    # Invalid spans scatter to DISTINCT out-of-bounds slots (all dropped):
    # valid starts are strictly increasing, so every index is unique and the
    # unique_indices=True promise below is honest — a single shared d2
    # sentinel would be undefined behavior under that promise.
    starts2_safe = jnp.where(pos_ok, starts2,
                             d2 + jnp.arange(d1, dtype=starts2.dtype))
    # The tile-id delta and the depth rank scatter to the SAME span-start
    # positions. When both fit one 32-bit word (rank in the high bits so the
    # cummax fill stays monotone; the signed delta biased into the low
    # bits), ONE packed scatter replaces two — XLA's scatter cost is per
    # index, so this halves the dominant level-2 cost. (A (d2, 2) row
    # scatter is NOT equivalent: it lands in a T(2,128) layout that is 2.3x
    # slower than two 1-col scatters — measured v5e.)
    rank_bits = max(int(n - 1).bit_length(), 1)
    delta_bits = 32 - rank_bits  # uint32 packing
    # |delta| <= num_tiles (a jump never exceeds the grid) and the biased
    # value must be non-negative and fit delta_bits.
    if delta_bits >= 2 and num_tiles < (1 << (delta_bits - 1)):
        bias = 1 << (delta_bits - 1)
        packed2 = (
            (span_rank.astype(jnp.uint32) << delta_bits)
            | (span_base - prev_end + bias).astype(jnp.uint32)
        )
        init_val = jnp.uint32(1 + bias)  # rank 0, delta +1
        # starts2_safe is strictly increasing: valid span starts ascend, and
        # the invalid tail maps to d2 + iota (span_len == 0 only occurs past
        # total_spans — every kept span has len >= 1, so validity is a
        # prefix). Sorted + unique unlocks the fast scatter emitter path.
        scat = jnp.full((d2,), init_val).at[starts2_safe].set(
            packed2, mode="drop", unique_indices=True, indices_are_sorted=True
        )
        # cummax is monotone because the (monotone) rank occupies the high
        # bits; only the RANK is read from the filled array — the delta of
        # non-start positions is rebuilt as +1 from the PRE-fill array. A
        # start whose packed word equals init_val (rank 0, delta 1) is
        # indistinguishable from padding, and contributes identically.
        filled = jax.lax.cummax(scat)
        rank_of = (filled >> delta_bits).astype(jnp.int32)
        delta = jnp.where(
            scat != init_val,
            (scat & jnp.uint32(2 * bias - 1)).astype(jnp.int32) - bias,
            1,
        )
        tile_lin = jnp.cumsum(delta)
    else:
        delta = jnp.ones((d2,), jnp.int32)
        delta = delta.at[starts2_safe].set(span_base - prev_end, mode="drop",
                                           unique_indices=True,
                                           indices_are_sorted=True)
        tile_lin = jnp.cumsum(delta)
        mark2 = jnp.zeros((d2,), jnp.int32).at[starts2_safe].max(
            span_rank, mode="drop", indices_are_sorted=True)
        rank_of = jax.lax.cummax(mark2)  # monotone across spans

    in_range = jnp.arange(d2) < jnp.minimum(total2, d2)
    tile_of = jnp.where(in_range, tile_lin, num_tiles).astype(jnp.int32)
    depth_rank = jnp.where(in_range, rank_of, 0)

    # Entries are generated in depth order, so one stable single-key sort by
    # tile yields front-to-back order within every tile.
    sorted_tile, sorted_rank = jax.lax.sort(
        (tile_of, depth_rank), num_keys=1, is_stable=True
    )

    # Per-tile ranges in the sorted list. One searchsorted is enough:
    # right-edge of tile t == left-edge of tile t+1, and the last tile ends
    # where the pad entries (tile id == num_tiles) begin — the kept-entry
    # count.
    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_starts = jnp.searchsorted(sorted_tile, tile_ids, side="left")
    kept = jnp.minimum(total2, d2).astype(tile_starts.dtype)
    tile_ends = jnp.concatenate([tile_starts[1:], kept[None]])
    full_counts = (tile_ends - tile_starts).astype(jnp.int32)

    # Rank of each entry within its tile, gather-free: sorted_tile is sorted,
    # so the rank is the distance to the current run's start (one cummax).
    d = jnp.arange(sorted_tile.shape[0], dtype=jnp.int32)
    change = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_tile[1:] != sorted_tile[:-1]]
    )
    run_start = jax.lax.cummax(jnp.where(change, d, 0))
    within = d - run_start
    return (sorted_tile, sorted_rank, within, tile_starts, full_counts,
            total, order, span_overflow)


def bin_splats(
    xys: jax.Array,
    depths: jax.Array,
    radii: jax.Array,
    valid: jax.Array,
    tiles_x: int,
    tiles_y: int,
    tile_size: int = 16,
    dup_capacity: int = 0,
    max_per_tile: int = 0,
    span_capacity: int = 0,
    conics: Optional[jax.Array] = None,
    opacities: Optional[jax.Array] = None,
    row_stride: int = 1,
    row_offset=0,
    tile_size_x: int = 0,
) -> TileBins:
    """Build depth-sorted per-tile splat lists (dense index table).

    Args:
      xys/depths/radii/valid: projected splat state (N leading dim).
      tiles_x/tiles_y: tile grid dims (static).
      dup_capacity: static total intersection budget (default 8*N).
      max_per_tile: static per-tile list length (default min(4096, N), rounded
        up to a multiple of 8 for TPU-friendly layouts).
      span_capacity: static (splat, tile-row) span budget (default
        max(dup_capacity // 2, 2 * N)).
      conics/opacities: when given, enables the exact alpha-test ellipse cull
        (see _sorted_intersections) — strictly fewer intersections, identical
        composited images and gradients.
    """
    n = xys.shape[0]
    num_tiles = tiles_x * tiles_y
    if dup_capacity <= 0:
        dup_capacity = 8 * n
    if max_per_tile <= 0:
        max_per_tile = min(4096, n)
    max_per_tile = max(8, (max_per_tile + 7) // 8 * 8)

    (sorted_tile, sorted_rank, within, tile_starts, full_counts, total,
     order, span_overflow) = _sorted_intersections(
        xys, depths, radii, valid, tiles_x, tiles_y, tile_size, dup_capacity,
        span_capacity=span_capacity, conics=conics, opacities=opacities,
        row_stride=row_stride, row_offset=row_offset, tile_size_x=tile_size_x,
    )
    # This (XLA fallback) path keeps original-splat-id semantics in its
    # tables; the depth-rank -> id conversion costs one 1-col gather.
    sorted_splat = order[sorted_rank].astype(jnp.int32)
    counts = jnp.minimum(full_counts, max_per_tile)

    # Scatter sorted entries into the dense (num_tiles, max_per_tile) table.
    keep = (sorted_tile < num_tiles) & (within < max_per_tile)
    flat_pos = jnp.where(
        keep, sorted_tile * max_per_tile + within, num_tiles * max_per_tile
    )
    idx_flat = jnp.full((num_tiles * max_per_tile,), -1, jnp.int32)
    idx_flat = idx_flat.at[flat_pos].set(
        sorted_splat, mode="drop", unique_indices=True
    )
    idx_lists = idx_flat.reshape(num_tiles, max_per_tile)

    dup_overflow = (
        jnp.maximum(total - dup_capacity, 0).astype(jnp.int32) + span_overflow
    )
    tile_overflow = jnp.sum(full_counts - counts).astype(jnp.int32)
    return TileBins(
        idx_lists=idx_lists,
        counts=counts,
        total_intersections=total.astype(jnp.int32),
        dup_overflow=dup_overflow,
        tile_overflow=tile_overflow,
    )


def bin_splats_dense(
    xys: jax.Array,
    depths: jax.Array,
    radii: jax.Array,
    valid: jax.Array,
    tiles_x: int,
    tiles_y: int,
    tile_size: int = 16,
    chunk: int = 128,
    dup_capacity: int = 0,
    max_per_tile: int = 0,
    span_capacity: int = 0,
    conics: Optional[jax.Array] = None,
    opacities: Optional[jax.Array] = None,
    row_stride: int = 1,
    row_offset=0,
    tile_size_x: int = 0,
) -> DenseBins:
    """Build the unpadded dense intersection layout (see DenseBins).

    The sort output IS the layout: no per-tile alignment, no placement
    scatter (the old FlatBins entry scatter was ~7 ms/step at bench scale on
    v5e). Tile segments are located by ``tile_starts``/``counts``; entries
    beyond ``max_per_tile`` stay in the array (depth-ordered, so they are the
    segment's tail) but are excluded from ``counts`` — the kernels simply
    never walk them.
    """
    n = xys.shape[0]
    num_tiles = tiles_x * tiles_y
    if dup_capacity <= 0:
        dup_capacity = 8 * n
    dup_capacity = (dup_capacity + chunk - 1) // chunk * chunk
    if max_per_tile <= 0:
        max_per_tile = min(4096, max(dup_capacity // max(num_tiles, 1), 2 * chunk))
    max_per_tile = (max_per_tile + chunk - 1) // chunk * chunk

    (sorted_tile, sorted_rank, within, tile_starts, full_counts, total,
     order, span_overflow) = _sorted_intersections(
        xys, depths, radii, valid, tiles_x, tiles_y, tile_size, dup_capacity,
        span_capacity=span_capacity, conics=conics, opacities=opacities,
        row_stride=row_stride, row_offset=row_offset, tile_size_x=tile_size_x,
    )
    counts = jnp.minimum(full_counts, max_per_tile)
    pad_entries = sorted_tile >= num_tiles
    entry_rank = jnp.where(pad_entries, -1, sorted_rank).astype(jnp.int32)
    # One trailing all-pad chunk: DMA windows [start + k*chunk, +chunk) must
    # never cross the array end (dynamic-slice starts CLAMP, silently
    # shifting the window — measured, not hypothetical).
    entry_rank = jnp.concatenate(
        [entry_rank, jnp.full((chunk,), -1, jnp.int32)]
    )
    num_entries = jnp.minimum(total, dup_capacity).astype(jnp.int32)

    dup_overflow = (
        jnp.maximum(total - dup_capacity, 0).astype(jnp.int32) + span_overflow
    )
    tile_overflow = jnp.sum(full_counts - counts).astype(jnp.int32)
    return DenseBins(
        entry_rank=entry_rank,
        order=order.astype(jnp.int32),
        tile_starts=tile_starts.astype(jnp.int32),
        counts=counts,
        num_entries=num_entries,
        total_intersections=total.astype(jnp.int32),
        dup_overflow=dup_overflow,
        tile_overflow=tile_overflow,
    )
