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


class FlatBins(NamedTuple):
    """CHUNK-aligned flat intersection layout for the Pallas rasterizer.

    Entries live in one flat array of ``num_blocks * chunk`` slots; each
    tile's (depth-sorted) entries occupy a contiguous, chunk-aligned segment,
    padded with -1. Every chunk-sized block therefore belongs to exactly one
    tile — the Pallas grid walks blocks with zero idle steps. Tiles with no
    intersections still get one (all-pad) block so their output tile is
    initialized.
    """

    entry_splat: jax.Array  # (num_blocks * chunk,) int32 splat ids, -1 pad
    block_tile: jax.Array  # (num_blocks,) int32 owning tile of each block
    block_first: jax.Array  # (num_blocks,) int32 1 if first block of its tile
    num_blocks_used: jax.Array  # () int32 blocks actually populated
    total_intersections: jax.Array  # () int32
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
):
    """Shared core: (tile, depth)-sorted intersection entries + tile ranges.

    Returns (sorted_tile, sorted_splat, tile_starts, full_counts, total).
    Entries with tile id == num_tiles are padding.

    TPU cost shape: the naive pipeline sorts dup_capacity entries by two keys
    and runs an O(D log N) searchsorted. Instead we (a) depth-sort the N
    splats first (N << D) so duplicates are *generated* in depth order and
    one single-key stable sort by tile finishes the job, and (b) compute the
    slot->splat inverse map with a scatter + cummax (two linear passes)
    rather than a searchsorted.
    """
    num_tiles = tiles_x * tiles_y
    bx0, bx1, by0, by1 = tile_ranges(xys, radii, tiles_x, tiles_y, tile_size)
    widths = bx1 - bx0
    counts_all = jnp.where(valid, widths * (by1 - by0), 0)
    total = jnp.sum(counts_all)

    # Depth-presort the splats (stable: splat index breaks ties -> the
    # composited image is deterministic and sharding-invariant).
    order = jnp.argsort(jnp.where(valid, depths, jnp.inf), stable=True)

    # PERF: XLA:TPU serializes 1-D scalar gathers (each element is its own
    # access) but vectorizes multi-column row gathers; pack every per-splat
    # attribute needed downstream into one i32 matrix and gather rows once.
    # (Measured on v5e: 5 scalar gathers at D=2M cost ~130 ms, one (D, 8)
    # row gather costs <1 ms.)
    packed = jnp.stack(
        [counts_all, jnp.maximum(widths, 1), bx0, by0,
         jnp.arange(counts_all.shape[0], dtype=jnp.int32)],
        axis=1,
    )[order]  # (N, 5): counts_o, widths_o, bx0_o, by0_o, orig id
    counts_o = packed[:, 0]

    # Slot ranges per depth-ordered splat.
    ends = jnp.cumsum(counts_o)
    starts = ends - counts_o
    packed = jnp.concatenate([starts[:, None], packed[:, 1:]], axis=1)
    # (N, 5): starts, widths_o, bx0_o, by0_o, orig id

    # Inverse map via scatter + cummax: the owner of slot range [starts[i],
    # ends[i]) is the max splat index scattered at starts[i] (zero-count
    # splats collide only with smaller indices; see git history for proof).
    slots = jnp.arange(dup_capacity, dtype=counts_o.dtype)
    n = counts_o.shape[0]
    mark = jnp.zeros((dup_capacity,), jnp.int32)
    mark = mark.at[starts].max(jnp.arange(n, dtype=jnp.int32), mode="drop")
    splat_of = jax.lax.cummax(mark)
    in_range = slots < jnp.minimum(total, dup_capacity)

    g = packed[splat_of]  # (D, 5) single row gather
    rank = slots - g[:, 0]
    w = g[:, 1]
    # Tile of each slot from its rank inside the splat's tile rectangle.
    # floor((rank + 0.5) / w) == rank // w exactly for 0 <= rank < 2^22,
    # w >= 1 — and float division is one VPU op vs the multi-op integer
    # division expansion.
    ty_off = jnp.floor((rank.astype(jnp.float32) + 0.5) / w.astype(jnp.float32)).astype(jnp.int32)
    tx = g[:, 2] + (rank - ty_off * w)
    ty = g[:, 3] + ty_off
    tile_of = (ty * tiles_x + tx).astype(jnp.int32)
    # Invalid slots sort to the end (tile id = num_tiles).
    tile_of = jnp.where(in_range, tile_of, num_tiles)
    orig_id = jnp.where(in_range, g[:, 4], 0)

    # Entries are already depth-ordered, so one stable single-key sort by
    # tile yields front-to-back order within every tile.
    sorted_tile, sorted_splat = jax.lax.sort(
        (tile_of, orig_id), num_keys=1, is_stable=True
    )

    # Per-tile ranges in the sorted list.
    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_starts = jnp.searchsorted(sorted_tile, tile_ids, side="left")
    tile_ends = jnp.searchsorted(sorted_tile, tile_ids, side="right")
    full_counts = (tile_ends - tile_starts).astype(jnp.int32)

    # Rank of each entry within its tile, gather-free: sorted_tile is sorted,
    # so the rank is the distance to the current run's start (one cummax).
    d = jnp.arange(sorted_tile.shape[0], dtype=jnp.int32)
    change = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_tile[1:] != sorted_tile[:-1]]
    )
    run_start = jax.lax.cummax(jnp.where(change, d, 0))
    within = d - run_start
    return sorted_tile, sorted_splat, within, tile_starts, full_counts, total


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
    """Build depth-sorted per-tile splat lists (dense index table).

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

    sorted_tile, sorted_splat, within, tile_starts, full_counts, total = (
        _sorted_intersections(
            xys, depths, radii, valid, tiles_x, tiles_y, tile_size, dup_capacity
        )
    )
    counts = jnp.minimum(full_counts, max_per_tile)

    # Scatter sorted entries into the dense (num_tiles, max_per_tile) table.
    keep = (sorted_tile < num_tiles) & (within < max_per_tile)
    flat_pos = jnp.where(
        keep, sorted_tile * max_per_tile + within, num_tiles * max_per_tile
    )
    idx_flat = jnp.full((num_tiles * max_per_tile,), -1, jnp.int32)
    idx_flat = idx_flat.at[flat_pos].set(
        sorted_splat.astype(jnp.int32), mode="drop", unique_indices=True
    )
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


def flat_num_blocks(dup_capacity: int, num_tiles: int, chunk: int) -> int:
    """Static block-count bound for the flat layout: every intersection plus
    at most one partial/empty block per tile."""
    return dup_capacity // chunk + num_tiles


def bin_splats_flat(
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
) -> FlatBins:
    """Build the chunk-aligned flat intersection layout (see FlatBins).

    Same sorted-intersection core as :func:`bin_splats`; entries are scattered
    to ``aligned_start[tile] + within_rank`` where aligned starts are the
    exclusive cumsum of per-tile padded counts ``max(chunk,
    ceil(min(count, max_per_tile)/chunk)*chunk)``.
    """
    n = xys.shape[0]
    num_tiles = tiles_x * tiles_y
    if dup_capacity <= 0:
        dup_capacity = 8 * n
    dup_capacity = (dup_capacity + chunk - 1) // chunk * chunk
    if max_per_tile <= 0:
        max_per_tile = min(4096, max(dup_capacity // max(num_tiles, 1), 2 * chunk))
    max_per_tile = (max_per_tile + chunk - 1) // chunk * chunk

    sorted_tile, sorted_splat, within, tile_starts, full_counts, total = (
        _sorted_intersections(
            xys, depths, radii, valid, tiles_x, tiles_y, tile_size, dup_capacity
        )
    )
    counts = jnp.minimum(full_counts, max_per_tile)

    # Chunk-aligned segment starts (>= 1 block even for empty tiles).
    padded = jnp.maximum((counts + chunk - 1) // chunk, 1) * chunk
    seg_ends = jnp.cumsum(padded)
    seg_starts = seg_ends - padded
    num_blocks = flat_num_blocks(dup_capacity, num_tiles, chunk)
    flat_size = num_blocks * chunk

    # Scatter sorted entries into their aligned positions.
    safe_tile = jnp.minimum(sorted_tile, num_tiles - 1)
    keep = (sorted_tile < num_tiles) & (within < max_per_tile)
    pos = jnp.where(keep, seg_starts[safe_tile] + within, flat_size)
    entry_splat = jnp.full((flat_size,), -1, jnp.int32)
    entry_splat = entry_splat.at[pos].set(
        sorted_splat.astype(jnp.int32), mode="drop", unique_indices=True
    )

    # Per-block metadata. Blocks past the used range belong to the last tile
    # and are all-pad (no-ops in the kernel).
    blocks = jnp.arange(num_blocks, dtype=jnp.int32)
    block_ends = (seg_ends // chunk).astype(jnp.int32)
    block_tile = jnp.minimum(
        jnp.searchsorted(block_ends, blocks, side="right").astype(jnp.int32),
        num_tiles - 1,
    )
    block_starts_of_tile = (seg_starts // chunk).astype(jnp.int32)
    block_first = (blocks == block_starts_of_tile[block_tile]).astype(jnp.int32)
    # Unused trailing blocks must not re-initialize the last tile's output.
    used = block_ends[num_tiles - 1]
    block_first = jnp.where(blocks < used, block_first, 0)

    dup_overflow = jnp.maximum(total - sorted_tile.shape[0], 0).astype(jnp.int32)
    tile_overflow = jnp.sum(full_counts - counts).astype(jnp.int32)
    return FlatBins(
        entry_splat=entry_splat,
        block_tile=block_tile,
        block_first=block_first,
        num_blocks_used=used,
        total_intersections=total.astype(jnp.int32),
        dup_overflow=dup_overflow,
        tile_overflow=tile_overflow,
    )
