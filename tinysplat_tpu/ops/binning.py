"""Tile binning: splat -> (tile, depth)-sorted intersection lists (pure XLA).

TPU-native replacement for the CUDA radix-sort binning hidden inside
``gsplat.rasterize_gaussians`` (map-gaussians-to-intersects + sort by
(tile_id, depth) + tile bin edges; see SURVEY.md section 2.2, reference call
site /root/reference/tinysplat/splatting/rasterize.py:44). There are no
atomics or dynamic allocations on TPU, so the classic pipeline is recast with
static shapes:

1. Each splat covers a rectangle of 16x16 tiles (AABB of its 3-sigma radius,
   projection.tile_ranges). Exclusive-cumsum of per-splat tile counts gives
   each splat a contiguous range of "duplicate" slots in a fixed budget of
   ``dup_capacity`` entries.
2. The inverse map (slot -> splat) is a ``searchsorted`` over the cumsum —
   O(D log N), fully vectorized; slot -> tile comes from the slot's rank
   inside its splat's rectangle.
3. One ``jax.lax.sort`` with two keys (tile_id, depth) and a stable flag
   orders every tile's intersections front-to-back; per-splat input index
   order breaks depth ties deterministically (sharding-invariant, SURVEY.md
   section 7 'sorted-order determinism').
4. Per-tile contiguous lists are scattered into a dense (num_tiles,
   max_per_tile) index table, padded with -1. Overflowing tiles keep their
   *nearest* max_per_tile splats (entries arrive depth-sorted).

Both capacity knobs are static; overflow is reported as device scalars so the
caller can grow them (one recompile, same pattern as splat-capacity growth).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .projection import tile_ranges


class TileBins(NamedTuple):
    """Per-tile splat index lists in front-to-back depth order."""

    idx_lists: jax.Array  # (num_tiles, max_per_tile) int32 splat ids, -1 pad
    counts: jax.Array  # (num_tiles,) int32 clamped to max_per_tile
    # Diagnostics (device scalars; fetch asynchronously):
    total_intersections: jax.Array  # () int32 before any clamping
    dup_overflow: jax.Array  # () int32 intersections dropped by dup_capacity
    tile_overflow: jax.Array  # () int32 entries dropped by max_per_tile


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
) -> TileBins:
    """Build depth-sorted per-tile splat lists.

    Args:
      xys/depths/radii/valid: projected splat state (N leading dim).
      tiles_x/tiles_y: tile grid dims (static).
      dup_capacity: static total intersection budget (default 8*N).
      max_per_tile: static per-tile list length (default min(4096, N), rounded
        up to a multiple of 8 for TPU-friendly layouts).
    """
    n = xys.shape[0]
    num_tiles = tiles_x * tiles_y
    if dup_capacity <= 0:
        dup_capacity = 8 * n
    if max_per_tile <= 0:
        max_per_tile = min(4096, n)
    max_per_tile = max(8, (max_per_tile + 7) // 8 * 8)

    bx0, bx1, by0, by1 = tile_ranges(xys, radii, tiles_x, tiles_y, tile_size)
    widths = bx1 - bx0
    counts_per_splat = jnp.where(valid, widths * (by1 - by0), 0)
    total = jnp.sum(counts_per_splat)

    # Slot ranges per splat: splat i owns slots [offsets[i], offsets[i+1]).
    ends = jnp.cumsum(counts_per_splat)  # inclusive cumsum = range ends
    starts = ends - counts_per_splat

    # Inverse map: slot d belongs to the splat whose end is the first > d.
    slots = jnp.arange(dup_capacity, dtype=counts_per_splat.dtype)
    splat_of = jnp.searchsorted(ends, slots, side="right").astype(jnp.int32)
    in_range = slots < jnp.minimum(total, dup_capacity)
    splat_of = jnp.where(in_range, splat_of, 0)

    # Tile of each slot from its rank inside the splat's tile rectangle.
    rank = slots - starts[splat_of]
    w = jnp.maximum(widths[splat_of], 1)
    tx = bx0[splat_of] + rank % w
    ty = by0[splat_of] + rank // w
    tile_of = (ty * tiles_x + tx).astype(jnp.int32)
    # Invalid slots sort to the end (tile id = num_tiles).
    tile_of = jnp.where(in_range, tile_of, num_tiles)

    # Lexicographic stable sort by (tile, depth); stability preserves the
    # per-splat input order for equal depths -> deterministic images.
    depth_of = jnp.where(in_range, depths[splat_of], jnp.inf)
    sorted_tile, _, sorted_splat = jax.lax.sort(
        (tile_of, depth_of.astype(jnp.float32), splat_of), num_keys=2, is_stable=True
    )

    # Per-tile ranges in the sorted list.
    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_starts = jnp.searchsorted(sorted_tile, tile_ids, side="left")
    tile_ends = jnp.searchsorted(sorted_tile, tile_ids, side="right")
    full_counts = (tile_ends - tile_starts).astype(jnp.int32)
    counts = jnp.minimum(full_counts, max_per_tile)

    # Scatter sorted entries into the dense (num_tiles, max_per_tile) table.
    d = jnp.arange(dup_capacity)
    within = d - tile_starts[jnp.minimum(sorted_tile, num_tiles - 1)]
    keep = (sorted_tile < num_tiles) & (within < max_per_tile)
    flat_pos = jnp.where(
        keep, sorted_tile * max_per_tile + within, num_tiles * max_per_tile
    )
    idx_flat = jnp.full((num_tiles * max_per_tile,), -1, jnp.int32)
    idx_flat = idx_flat.at[flat_pos].set(sorted_splat.astype(jnp.int32), mode="drop")
    idx_lists = idx_flat.reshape(num_tiles, max_per_tile)

    dup_overflow = jnp.maximum(total - dup_capacity, 0).astype(jnp.int32)
    tile_overflow = jnp.sum(full_counts - counts).astype(jnp.int32)
    return TileBins(
        idx_lists=idx_lists,
        counts=counts,
        total_intersections=total.astype(jnp.int32),
        dup_overflow=dup_overflow,
        tile_overflow=tile_overflow,
    )
