"""Pallas TPU rasterization kernels: fused forward + analytic backward.

The performance path of the framework — the TPU-native replacement for the
gsplat CUDA ``rasterize_gaussians`` forward/backward kernels the reference
calls at /root/reference/tinysplat/splatting/rasterize.py:44,50. Semantics
are identical to ``rasterize_dense`` (and therefore to the CUDA kernel's
front-to-back compositing with early exit; see that module's docstring).

Work decomposition
------------------
``bin_splats_flat`` lays every tile's depth-sorted intersections out in
chunk-aligned segments of one flat array, so each CHUNK-entry block belongs
to exactly one 16x16 tile. The kernel grid is simply *(num_blocks,)* — a
compacted worklist with zero idle steps (unlike a (tiles, max_chunks) grid,
no tile pays for the worst-case list length). Per-tile sequencing falls out
of grid order: Pallas keeps the output tile block resident in VMEM across
consecutive grid steps of the same tile and spills it exactly once.

Per block (P = 256 pixels x CHUNK entries, all in VMEM):
  - alphas: pure VPU elementwise work on (P, CHUNK) tiles;
  - transmittance: one exclusive cumulative product along the entry axis,
    seeded by a per-pixel carry in scratch (persists across blocks);
  - compositing: one (4, CHUNK) x (P, CHUNK) contraction on the MXU;
  - early-out: blocks whose tile is already saturated (max T <= 1e-4) skip
    all compute.

The backward kernel walks the same worklist in reverse, reconstructing the
per-entry transmittance analytically from the saved final transmittance
(T_before = T_end / suffix-product — the same back-to-front recurrence as the
CUDA backward, but vectorized over the whole block; safe because every
*composited* entry keeps T > 1e-4 and 1 - alpha >= 1e-3). A per-pixel count
of composited entries saved by the forward pass reproduces the early-exit
boundary exactly. Gradients w.r.t. per-entry attributes are emitted in the
same flat layout; the XLA-level gather that built the layout scatter-adds
them back to the per-splat arrays via ordinary autodiff.
"""
from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import bin_splats_flat, flat_num_blocks
from .rasterize_dense import ALPHA_EPS, ALPHA_MAX, T_EPS

TILE = 16
P = TILE * TILE  # pixels per tile
ROWS = 16  # attribute rows: [x, y, con_a, con_b, con_c, opac, c0..c3, pad..]
OUT_ROWS = 8  # output rows: [c0..c3, T_final, n_contrib, pad, pad]


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@jax.custom_vjp
def _gather_rows(table: jax.Array, ids: jax.Array) -> jax.Array:
    """Row gather ``table[ids]`` with a 16-bit forward trick.

    XLA:TPU's gather emitter costs per INDEX but scales with row byte-width
    below 4 bytes: gathering the table as bitcast int16 pairs and bitcasting
    back is ~2.3x faster than the f32 row gather (measured v5e, 2M indices)
    and reconstructs the rows EXACTLY (pure bit movement). The backward is
    the same scatter-add the plain gather's autodiff transpose produces.
    """
    return table[ids]


def _gather_rows_fwd(table, ids):
    n, r = table.shape
    t16 = jax.lax.bitcast_convert_type(table, jnp.int16).reshape(n, 2 * r)
    g16 = t16[ids]
    out = jax.lax.bitcast_convert_type(
        g16.reshape(ids.shape[0], r, 2), jnp.float32
    )
    return out, (ids, n)


def _gather_rows_bwd(res, g):
    ids, n = res
    dtable = jnp.zeros((n, g.shape[1]), g.dtype).at[ids].add(g)
    return dtable, np.zeros(ids.shape, jax.dtypes.float0)


_gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


def _cumprod_lanes(x: jax.Array) -> jax.Array:
    """Inclusive cumulative product along axis=1 (lanes).

    Log-step (Hillis-Steele) formulation — Mosaic has no native cumprod.
    Lane count must be a power of two (enforced by the wrapper).
    """
    n = x.shape[1]
    shift = 1
    while shift < n:
        shifted = jnp.concatenate([jnp.ones_like(x[:, :shift]), x[:, : n - shift]], axis=1)
        x = x * shifted
        shift *= 2
    return x


def _cumsum_lanes(x: jax.Array) -> jax.Array:
    """Inclusive cumulative sum along axis=1 (lanes); see _cumprod_lanes."""
    n = x.shape[1]
    shift = 1
    while shift < n:
        shifted = jnp.concatenate([jnp.zeros_like(x[:, :shift]), x[:, : n - shift]], axis=1)
        x = x + shifted
        shift *= 2
    return x


def _pixel_coords(tile_id, tiles_x: int, dtype=jnp.float32):
    """(P, 1) x and y pixel coordinates of a tile's pixels."""
    pidx = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    lx = (pidx % TILE).astype(dtype)
    ly = (pidx // TILE).astype(dtype)
    ox = ((tile_id % tiles_x) * TILE).astype(dtype)
    oy = ((tile_id // tiles_x) * TILE).astype(dtype)
    return lx + ox, ly + oy


def _alphas(attrs, px, py):
    """Recompute (P, CHUNK) masked alphas from an attribute block.

    Returns (alpha_masked, alpha_raw, exp_neg_sigma, dx, dy, grad_ok).
    """
    gx = attrs[0:1, :]
    gy = attrs[1:2, :]
    ca = attrs[2:3, :]
    cb = attrs[3:4, :]
    cc = attrs[4:5, :]
    op = attrs[5:6, :]
    dx = px - gx  # (P, CHUNK)
    dy = py - gy
    sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
    e = jnp.exp(-sigma)
    raw = op * e
    alpha = jnp.minimum(ALPHA_MAX, raw)
    keep = (sigma >= 0.0) & (alpha >= ALPHA_EPS)
    alpha_m = jnp.where(keep, alpha, 0.0)
    grad_ok = keep & (raw < ALPHA_MAX)  # min() clamps gradient at 0.999
    return alpha_m, e, dx, dy, grad_ok


def _fwd_kernel(tiles_x: int, chunk: int,
                block_tile, block_first, block_last, used,
                attrs_ref, out_ref, t_scr, n_scr):
    w = pl.program_id(0)
    tile = block_tile[w]
    attrs = attrs_ref[0]  # (ROWS, CHUNK)
    # Grid blocks past num_blocks_used are all-pad (their attrs DMA is
    # redirected to block 0 by the index_map, so they cost nothing): skip.
    in_used = w < used[0]

    # Scratch columns: 0 = frozen T (value when the pixel stopped
    # compositing — the CUDA kernel's output T), 1 = raw T (product over ALL
    # masked alphas, monotone — the liveness test). They agree until a pixel
    # crosses T_EPS; afterwards raw keeps falling (so the pixel can never
    # resurrect in a later block) while frozen holds the output value.
    @pl.when(in_used & (block_first[w] == 1))
    def _():
        t_scr[:, 0:2] = jnp.ones((P, 2), jnp.float32)
        n_scr[:, 0:1] = jnp.zeros((P, 1), jnp.float32)
        out_ref[0] = jnp.zeros((OUT_ROWS, P), jnp.float32)

    t_raw_in = t_scr[:, 1:2]  # (P, 1)

    @pl.when(in_used & (jnp.max(t_raw_in) > T_EPS))
    def _():
        t_fro_in = t_scr[:, 0:1]
        px, py = _pixel_coords(tile, tiles_x)
        alpha, _, _, _, _ = _alphas(attrs, px, py)
        om = 1.0 - alpha  # >= 1e-3 wherever alpha > 0 (clamped at 0.999)
        incl = t_raw_in * _cumprod_lanes(om)  # (P, CHUNK)
        live = incl > T_EPS  # exact CUDA early-exit rule
        excl = incl / om
        wmat = jnp.where(live, alpha * excl, 0.0)
        colors = attrs[6:10, :]  # (4, CHUNK)
        contrib = jax.lax.dot_general(
            colors, wmat, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (4, P)
        out_ref[0, 0:4, :] += contrib
        t_fro = jnp.min(
            jnp.where(live, incl, jnp.broadcast_to(t_fro_in, incl.shape)),
            axis=1,
            keepdims=True,
        )
        t_scr[:, 0:1] = jnp.minimum(t_fro, t_fro_in)
        t_scr[:, 1:2] = incl[:, -1:]
        n_scr[:, 0:1] = n_scr[:, 0:1] + jnp.sum(
            live.astype(jnp.float32), axis=1, keepdims=True
        )

    @pl.when(in_used & (block_last[w] == 1))
    def _():
        out_ref[0, 4:5, :] = jnp.swapaxes(t_scr[:, 0:1], 0, 1)
        out_ref[0, 5:6, :] = jnp.swapaxes(n_scr[:, 0:1], 0, 1)


def _bwd_kernel(tiles_x: int, chunk: int, num_blocks: int,
                block_tile, block_last, block_rank, used,
                attrs_ref, fwd_ref, gout_ref, dattrs_ref, t_scr, s_scr):
    w = pl.program_id(0)
    b = num_blocks - 1 - w
    tile = block_tile[b]
    attrs = attrs_ref[0]  # (ROWS, CHUNK)
    # The reverse walk visits the unused tail first; those blocks' DMAs are
    # redirected to block 0 and their whole body is skipped (their dattrs
    # stay unwritten — all their entry ids are -1, so the gather transpose
    # scatter-adds any garbage into the discarded sentinel row).
    in_used = b < used[0]

    @pl.when(w == 0)
    def _():
        t_scr[:, 0:1] = jnp.ones((P, 1), jnp.float32)
        s_scr[:, 0:1] = jnp.zeros((P, 1), jnp.float32)

    @pl.when(in_used & (block_last[b] == 1))
    def _():
        t_final = jnp.swapaxes(fwd_ref[0, 4:5, :], 0, 1)  # (P, 1)
        g_tfinal = jnp.swapaxes(gout_ref[0, 4:5, :], 0, 1)
        t_scr[:, 0:1] = t_final
        s_scr[:, 0:1] = g_tfinal * t_final

    # Dead-block skip: if every pixel's live prefix ends before this block
    # (rank * chunk >= max n_contrib), all entries have zero weight AND zero
    # gradient, and the T/s carries pass through unchanged (alpha == 0 =>
    # om == 1). Saturated tails of dense tiles — the common case after a few
    # front blocks — cost one zero-write instead of the full gradient math.
    n_contrib_max = jnp.max(fwd_ref[0, 5:6, :])
    dead = (block_rank[b] * chunk).astype(jnp.float32) >= n_contrib_max

    @pl.when(in_used & dead)
    def _():
        dattrs_ref[0] = jnp.zeros((ROWS, chunk), jnp.float32)

    @pl.when(in_used & jnp.logical_not(dead))
    def _():
        _bwd_block(tiles_x, chunk, tile, b, block_rank,
                   attrs, fwd_ref, gout_ref, dattrs_ref, t_scr, s_scr)


def _bwd_block(tiles_x, chunk, tile, b, block_rank,
               attrs, fwd_ref, gout_ref, dattrs_ref, t_scr, s_scr):
    px, py = _pixel_coords(tile, tiles_x)
    alpha, e_negsig, dx, dy, grad_ok = _alphas(attrs, px, py)

    # Live prefix from the saved per-pixel contribution count.
    n_contrib = jnp.swapaxes(fwd_ref[0, 5:6, :], 0, 1)  # (P, 1)
    rank = (
        block_rank[b] * chunk
        + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    ).astype(jnp.float32)
    live = rank < n_contrib  # (P, CHUNK)
    alpha = jnp.where(live, alpha, 0.0)
    om = 1.0 - alpha

    # Reconstruct per-entry exclusive transmittance from the suffix carry.
    t_end = t_scr[:, 0:1]
    pm = _cumprod_lanes(om)
    total = pm[:, chunk - 1 : chunk]
    t_start = t_end / total
    t_before = t_start * (pm / om)  # (P, CHUNK) exclusive prefix
    wmat = alpha * t_before

    g = gout_ref[0, 0:4, :]  # (4, P) composite cotangent
    colors = attrs[6:10, :]
    # Q[p, k] = sum_c g[c, p] * colors[c, k]
    q = jax.lax.dot_general(
        g, colors, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (P, CHUNK)
    qw = q * wmat
    csum = _cumsum_lanes(qw)
    total_qw = csum[:, chunk - 1 : chunk]
    s_after = s_scr[:, 0:1] + (total_qw - csum)  # (P, CHUNK)

    dalpha = q * t_before - s_after / om
    dsigma = jnp.where(grad_ok & live, -alpha * dalpha, 0.0)
    dopac = jnp.where(grad_ok & live, dalpha * e_negsig, 0.0)

    ca = attrs[2:3, :]
    cb = attrs[3:4, :]
    cc = attrs[4:5, :]
    # sigma = 0.5(a dx^2 + c dy^2) + b dx dy, dx = px - gx
    dgx = jnp.sum(dsigma * -(ca * dx + cb * dy), axis=0, keepdims=True)
    dgy = jnp.sum(dsigma * -(cc * dy + cb * dx), axis=0, keepdims=True)
    dca = jnp.sum(dsigma * 0.5 * dx * dx, axis=0, keepdims=True)
    dcb = jnp.sum(dsigma * dx * dy, axis=0, keepdims=True)
    dcc = jnp.sum(dsigma * 0.5 * dy * dy, axis=0, keepdims=True)
    dop = jnp.sum(dopac, axis=0, keepdims=True)
    # dL/dcolors[c, k] = sum_p g[c, p] * w[p, k]
    dcol = jax.lax.dot_general(
        g, wmat, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (4, CHUNK)

    zeros6 = jnp.zeros((ROWS - 10, chunk), jnp.float32)
    dattrs_ref[0] = jnp.concatenate(
        [dgx, dgy, dca, dcb, dcc, dop, dcol, zeros6], axis=0
    )

    # Carries for the previous (front-ward) block.
    t_scr[:, 0:1] = t_start
    s_scr[:, 0:1] = s_scr[:, 0:1] + total_qw


def _make_pallas_fns(num_tiles: int, tiles_x: int, num_blocks: int, chunk: int):
    """Build the custom-vjp'd kernel pair for static geometry params."""

    # Unused tail blocks (w >= used) redirect their attrs DMA to block 0,
    # which stays VMEM-resident across all of them — the tail costs neither
    # bandwidth nor compute (the kernels skip their bodies).
    def fwd_attr_idx(w, bt, bf, bl, us):
        return (jnp.where(w < us[0], w, 0), 0, 0)

    fwd_call = pl.pallas_call(
        functools.partial(_fwd_kernel, tiles_x, chunk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(num_blocks,),
            in_specs=[
                pl.BlockSpec((1, ROWS, chunk), fwd_attr_idx),
            ],
            out_specs=pl.BlockSpec(
                (1, OUT_ROWS, P), lambda w, bt, bf, bl, us: (bt[w], 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((P, 128), jnp.float32),
                pltpu.VMEM((P, 128), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((num_tiles, OUT_ROWS, P), jnp.float32),
        interpret=_interpret(),
    )

    def bwd_attr_idx(w, bt, bl, br, us):
        b = num_blocks - 1 - w
        return (jnp.where(b < us[0], b, 0), 0, 0)

    def bwd_tile_idx(w, bt, bl, br, us):
        return (bt[num_blocks - 1 - w], 0, 0)

    bwd_call = pl.pallas_call(
        functools.partial(_bwd_kernel, tiles_x, chunk, num_blocks),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(num_blocks,),
            in_specs=[
                pl.BlockSpec((1, ROWS, chunk), bwd_attr_idx),
                pl.BlockSpec((1, OUT_ROWS, P), bwd_tile_idx),
                pl.BlockSpec((1, OUT_ROWS, P), bwd_tile_idx),
            ],
            out_specs=pl.BlockSpec((1, ROWS, chunk), bwd_attr_idx),
            scratch_shapes=[
                pltpu.VMEM((P, 128), jnp.float32),
                pltpu.VMEM((P, 128), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((num_blocks, ROWS, chunk), jnp.float32),
        interpret=_interpret(),
    )

    @jax.custom_vjp
    def composite_tiles(attrs, block_tile, block_first, block_last, block_rank, used):
        return fwd_call(block_tile, block_first, block_last, used, attrs)

    def composite_fwd(attrs, block_tile, block_first, block_last, block_rank, used):
        out = fwd_call(block_tile, block_first, block_last, used, attrs)
        return out, (attrs, block_tile, block_last, block_rank, used, out)

    def composite_bwd(res, gout):
        attrs, block_tile, block_last, block_rank, used, fwd_out = res
        dattrs = bwd_call(block_tile, block_last, block_rank, used, attrs, fwd_out, gout)
        zero_int = lambda x: np.zeros(x.shape, jax.dtypes.float0)
        return (
            dattrs,
            zero_int(block_tile),
            zero_int(block_tile),
            zero_int(block_last),
            zero_int(block_rank),
            zero_int(used),
        )

    composite_tiles.defvjp(composite_fwd, composite_bwd)
    return composite_tiles


@functools.lru_cache(maxsize=32)
def _cached_pallas_fns(num_tiles, tiles_x, num_blocks, chunk):
    return _make_pallas_fns(num_tiles, tiles_x, num_blocks, chunk)


def rasterize_pallas(
    xys: jax.Array,
    depths: jax.Array,
    radii: jax.Array,
    conics: jax.Array,
    colors: jax.Array,
    opacities: jax.Array,
    valid: jax.Array,
    img_height: int,
    img_width: int,
    background: jax.Array,
    chunk: int = 128,
    dup_capacity: int = 0,
    max_per_tile: int = 0,
    flat_blocks: int = 0,
    span_capacity: int = 0,
    return_diagnostics: bool = False,
):
    """Rasterize to (H, W, C<=4) image + (H, W) alpha; dense-oracle semantics.

    Drop-in for :func:`rasterize_tiled` (16x16 tiles only). With
    return_diagnostics, also returns {'intersections', 'dropped'} device
    scalars (budget auto-tuning; fetch asynchronously).
    """
    n = xys.shape[0]
    c = colors.shape[-1]
    assert c <= 4, "pallas kernel composites up to 4 channels (RGB+D)"
    assert chunk & (chunk - 1) == 0, "chunk must be a power of two"
    tiles_x = (img_width + TILE - 1) // TILE
    tiles_y = (img_height + TILE - 1) // TILE
    num_tiles = tiles_x * tiles_y
    if dup_capacity <= 0:
        dup_capacity = 8 * n
    dup_capacity = (dup_capacity + chunk - 1) // chunk * chunk
    num_blocks = flat_num_blocks(dup_capacity, num_tiles, chunk)
    if flat_blocks > 0:
        num_blocks = min(num_blocks, flat_blocks)

    bins = bin_splats_flat(
        xys, depths, radii, valid, tiles_x, tiles_y, TILE,
        chunk=chunk, dup_capacity=dup_capacity, max_per_tile=max_per_tile,
        flat_blocks=flat_blocks, span_capacity=span_capacity,
        conics=conics, opacities=opacities,
    )
    ids = bins.entry_splat  # (num_blocks * chunk,) DEPTH RANKS

    # One (N+1, ROWS) per-splat attribute matrix + a single row gather: XLA:TPU
    # vectorizes wide row gathers far better than several narrow ones, and
    # the autodiff transpose becomes one row scatter-add. Entry ids are depth
    # RANKS, so the table is permuted by bins.order first (an N-row permute,
    # ~1000x cheaper than converting 8N entry ids). Pad entries (-1) redirect
    # to a zero SENTINEL row (opacity 0 => alpha 0 => no contribution; its
    # cotangents land in the sentinel row and are sliced off) — avoiding a
    # (D, ROWS) select pass, whose pred materialization and backward layout
    # copy cost ~100 ms/step at 2.9M entries on v5e.
    ecol = colors
    if c < 4:
        ecol = jnp.pad(ecol, ((0, 0), (0, 4 - c)))
    per_splat = jnp.concatenate(
        [
            xys,
            conics,
            opacities.reshape(-1, 1),
            ecol,
            jnp.zeros((n, ROWS - 10), xys.dtype),
        ],
        axis=1,
    ).astype(jnp.float32)[bins.order]
    table = jnp.concatenate([per_splat, jnp.zeros((1, ROWS), jnp.float32)])
    safe = jnp.where(ids < 0, n, ids)
    attr_cols = _gather_rows(table, safe)
    attrs = jnp.swapaxes(attr_cols.reshape(num_blocks, chunk, ROWS), 1, 2)

    # Per-block metadata for the worklist.
    blocks = jnp.arange(num_blocks, dtype=jnp.int32)
    block_tile = bins.block_tile
    block_first = bins.block_first
    # Last block of each tile: the block before the next tile's first block
    # (or the last used block).
    nxt = jnp.concatenate([block_first[1:], jnp.ones((1,), jnp.int32)])
    is_used = blocks < bins.num_blocks_used
    block_last = jnp.where(is_used & (nxt == 1), 1, 0).astype(jnp.int32)
    # Guarantee exactly one "last" per tile even with trailing unused blocks:
    # mark the block at num_blocks_used - 1 as last.
    block_last = block_last.at[jnp.maximum(bins.num_blocks_used - 1, 0)].set(1)
    # Rank of each block within its tile (for the bwd live-prefix test).
    first_idx = jnp.where(block_first == 1, blocks, 0)
    tile_first_block = jax.ops.segment_max(
        first_idx, block_tile, num_segments=num_tiles
    )
    block_rank = blocks - tile_first_block[block_tile]

    composite_tiles = _cached_pallas_fns(num_tiles, tiles_x, num_blocks, chunk)
    used = bins.num_blocks_used.reshape(1).astype(jnp.int32)
    out = composite_tiles(attrs, block_tile, block_first, block_last, block_rank, used)

    t_final = out[:, 4, :]  # (T, P)
    bg4 = background
    if c < 4:
        bg4 = jnp.pad(background, (0, 4 - c))
    img4 = out[:, 0:4, :] + t_final[:, None, :] * bg4[None, :, None]

    # (T, 4, P) -> (H, W, 4), crop to the true image size.
    img = img4.reshape(tiles_y, tiles_x, 4, TILE, TILE)
    img = jnp.transpose(img, (0, 3, 1, 4, 2)).reshape(
        tiles_y * TILE, tiles_x * TILE, 4
    )
    alpha = (1.0 - t_final).reshape(tiles_y, tiles_x, TILE, TILE)
    alpha = jnp.transpose(alpha, (0, 2, 1, 3)).reshape(tiles_y * TILE, tiles_x * TILE)
    img_out = img[:img_height, :img_width, :c]
    alpha_out = alpha[:img_height, :img_width]
    if return_diagnostics:
        diag = {
            "intersections": bins.total_intersections,
            "dup_dropped": bins.dup_overflow,
            "tile_dropped": bins.tile_overflow,
        }
        return img_out, alpha_out, diag
    return img_out, alpha_out
