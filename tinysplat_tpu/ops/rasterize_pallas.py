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
OUT_ROWS = 8  # output rows: [c0..c3, T_final, n_contrib, last_contrib, pad]


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@jax.custom_vjp
def _gather_attr_rows(table: jax.Array, ids: jax.Array) -> jax.Array:
    """ATTR-TABLE row gather ``table[ids]`` with a 16-bit forward trick.

    Specific to the ROWS=16 attribute layout (only the first 10 rows carry
    gradients — see _gather_attr_rows_bwd).

    XLA:TPU's gather emitter costs per INDEX but scales with row byte-width
    below 4 bytes: gathering the table as bitcast int16 pairs and bitcasting
    back is ~2.3x faster than the f32 row gather (measured v5e, 2M indices)
    and reconstructs the rows EXACTLY (pure bit movement). The backward is
    the same scatter-add the plain gather's autodiff transpose produces.
    """
    return table[ids]


def _gather_attr_rows_fwd(table, ids):
    n, r = table.shape
    t16 = jax.lax.bitcast_convert_type(table, jnp.int16).reshape(n, 2 * r)
    g16 = t16[ids]
    out = jax.lax.bitcast_convert_type(
        g16.reshape(ids.shape[0], r, 2), jnp.float32
    )
    return out, (ids, n)


def _gather_attr_rows_bwd(res, g):
    ids, n = res
    # Only the first 10 attr rows carry gradients (xy, conic, opacity, 4
    # colors); scatter-adding 40-byte rows instead of 64 shaves the
    # per-index emitter cost, and the pad columns are zero by construction.
    r = g.shape[1]
    used = min(10, r)
    dtable = jnp.zeros((n, used), g.dtype).at[ids].add(g[:, :used])
    if used < r:
        dtable = jnp.pad(dtable, ((0, 0), (0, r - used)))
    return dtable, np.zeros(ids.shape, jax.dtypes.float0)


_gather_attr_rows.defvjp(_gather_attr_rows_fwd, _gather_attr_rows_bwd)


def _tri_ones(n: int) -> jax.Array:
    """(n, n) upper-triangular ones (incl. diagonal): X @ U = inclusive scan."""
    i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (i <= j).astype(jnp.float32)


def _cumsum_lanes(x: jax.Array) -> jax.Array:
    """Inclusive cumulative sum along axis=1 (lanes) — ONE MXU contraction
    with the triangular ones matrix. The 7-step Hillis-Steele lane-shift
    scan costs ~0.45 us per (256, 128) block on the VPU (lane shifts are
    full-vreg permutes); the (P, C) x (C, C) matmul is ~4x cheaper and
    accumulates in f32 (bf16_3x passes — f32-equivalent)."""
    return jax.lax.dot_general(
        x, _tri_ones(x.shape[1]), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _cumprod_lanes(x: jax.Array) -> jax.Array:
    """Inclusive cumulative product along axis=1 via exp2(cumsum(log2 x)).

    Valid for x > 0 (compositing uses om = 1 - alpha >= 1e-3 wherever
    alpha > 0, om == 1 at masked entries, so log2 in [-10, 0]); relative
    error ~1e-6 vs the exact product chain — far inside the kernel's parity
    tolerances. Underflow (sums below -126) flushes to 0 exactly like the
    direct product chain."""
    return jnp.exp2(_cumsum_lanes(jnp.log2(x)))


def _shift_right_lanes(x: jax.Array, first: jax.Array) -> jax.Array:
    """[first, x[:, 0], ..., x[:, -2]] — turns an inclusive scan into the
    exclusive one without a (P, CHUNK) divide."""
    return jnp.concatenate(
        [jnp.broadcast_to(first, (x.shape[0], 1)), x[:, :-1]], axis=1
    )


def _pixel_coords_local(dtype=jnp.float32):
    """(P, 1) tile-LOCAL x and y pixel coordinates (0..TILE-1).

    The kernels work in tile-local coordinates: the splat center is shifted
    by the tile origin once per entry ((1, CHUNK) work) instead of adding the
    origin to every pixel. Beyond saving VPU work, local coordinates keep
    every quantity in the gradient moment expansion (see _bwd_block) at
    O(TILE) magnitude, so the px^2-weighted MXU moments suffer no
    catastrophic cancellation — with global pixel coordinates (up to ~4k)
    the M2 - 2 g M1 + g^2 M0 recombination would lose ~4 digits.
    """
    pidx = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    lx = (pidx % TILE).astype(dtype)
    ly = (pidx // TILE).astype(dtype)
    return lx, ly


def _tile_origin(tile_id, tiles_x: int, dtype=jnp.float32):
    ox = ((tile_id % tiles_x) * TILE).astype(dtype)
    oy = ((tile_id // tiles_x) * TILE).astype(dtype)
    return ox, oy


def _alphas(attrs, px, py, ox, oy):
    """Recompute (P, CHUNK) masked alphas from an attribute block.

    px/py are tile-LOCAL pixel coords; ox/oy the tile origin (scalars).
    Returns (alpha_masked, exp_neg_sigma, gx_loc, gy_loc, dx, dy, grad_ok).
    """
    gx = attrs[0:1, :] - ox  # (1, CHUNK) tile-local splat centers
    gy = attrs[1:2, :] - oy
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
    return alpha_m, e, gx, gy, dx, dy, grad_ok


def _fwd_kernel(tiles_x: int, chunk: int,
                block_tile, block_first, block_last, block_rank, used,
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
        n_scr[:, 0:2] = jnp.zeros((P, 2), jnp.float32)
        out_ref[0] = jnp.zeros((OUT_ROWS, P), jnp.float32)

    t_raw_in = t_scr[:, 1:2]  # (P, 1)

    @pl.when(in_used & (jnp.max(t_raw_in) > T_EPS))
    def _():
        t_fro_in = t_scr[:, 0:1]
        px, py = _pixel_coords_local()
        ox, oy = _tile_origin(tile, tiles_x)
        alpha, _, _, _, _, _, _ = _alphas(attrs, px, py, ox, oy)
        om = 1.0 - alpha  # >= 1e-3 wherever alpha > 0 (clamped at 0.999)
        incl = t_raw_in * _cumprod_lanes(om)  # (P, CHUNK)
        live = incl > T_EPS  # exact CUDA early-exit rule
        excl = _shift_right_lanes(incl, t_raw_in)
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
        # Per-pixel 1 + rank of the last entry that actually CONTRIBUTED
        # (alpha > 0 and still live) — the CUDA kernel's last_contributor.
        # Blocks past every pixel's last contributor are gradient-dead and
        # get dropped from the backward worklist entirely (composite_bwd).
        rank1 = (
            block_rank[w] * chunk
            + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        ).astype(jnp.float32) + 1.0
        contrib = live & (alpha > 0.0)
        lc = jnp.max(jnp.where(contrib, rank1, 0.0), axis=1, keepdims=True)
        n_scr[:, 1:2] = jnp.maximum(n_scr[:, 1:2], lc)

    @pl.when(in_used & (block_last[w] == 1))
    def _():
        out_ref[0, 4:5, :] = jnp.swapaxes(t_scr[:, 0:1], 0, 1)
        out_ref[0, 5:6, :] = jnp.swapaxes(n_scr[:, 0:1], 0, 1)
        out_ref[0, 6:7, :] = jnp.swapaxes(n_scr[:, 1:2], 0, 1)


def _bwd_kernel(tiles_x: int, chunk: int,
                eff_block, eff_tile, eff_rank, first_visit, n_live,
                attrs_ref, fg_ref, dattrs_ref, t_scr, s_scr):
    """Backward over a COMPACTED live-block worklist.

    The caller (composite_bwd) drops every block past all of its tile's
    live prefixes (their entries have zero weight and zero gradient, and
    the T/s carries pass through them unchanged since alpha == 0 there) and
    hands the surviving block ids, back-to-front, via the prefetched
    ``eff_block`` worklist. Saturated tails of dense tiles — the common case
    after a few front blocks — cost NOTHING here: no grid step, no DMA.
    ``first_visit`` marks each tile's first (deepest live) worklist entry,
    where the T/s carries are (re)seeded from the forward outputs; this is
    exact because the skipped deeper blocks leave T at t_final. Steps past
    ``n_live`` have their DMAs pinned to the last live block (the output
    buffer then never switches away, so nothing garbage is flushed).

    fg packs the forward outputs (rows 0:OUT_ROWS) and the composite
    cotangent (rows OUT_ROWS:) for this tile — ONE tile-indexed DMA per
    grid step instead of two.
    """
    w = pl.program_id(0)
    tile = eff_tile[w]
    attrs = attrs_ref[0]  # (ROWS, CHUNK)
    live = w < n_live[0]

    @pl.when(live & (first_visit[w] == 1))
    def _():
        t_final = jnp.swapaxes(fg_ref[0, 4:5, :], 0, 1)  # (P, 1)
        g_tfinal = jnp.swapaxes(fg_ref[0, OUT_ROWS + 4 : OUT_ROWS + 5, :], 0, 1)
        t_scr[:, 0:1] = t_final
        s_scr[:, 0:1] = g_tfinal * t_final

    @pl.when(live)
    def _():
        _bwd_block(tiles_x, chunk, tile, eff_rank[w],
                   attrs, fg_ref, dattrs_ref, t_scr, s_scr)


def _bwd_block(tiles_x, chunk, tile, block_rank,
               attrs, fg_ref, dattrs_ref, t_scr, s_scr):
    px, py = _pixel_coords_local()
    ox, oy = _tile_origin(tile, tiles_x)
    alpha, e_negsig, gx, gy, dx, dy, grad_ok = _alphas(attrs, px, py, ox, oy)

    # Live prefix from the saved per-pixel contribution count.
    n_contrib = jnp.swapaxes(fg_ref[0, 5:6, :], 0, 1)  # (P, 1)
    rank = (
        block_rank * chunk
        + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    ).astype(jnp.float32)
    live = rank < n_contrib  # (P, CHUNK)
    alpha = jnp.where(live, alpha, 0.0)
    om = 1.0 - alpha

    # Reconstruct per-entry exclusive transmittance from the suffix carry.
    t_end = t_scr[:, 0:1]
    pm = _cumprod_lanes(om)
    total = pm[:, chunk - 1 : chunk]
    # total underflows to 0 for deep high-alpha blocks; every underflowed
    # entry is past the live prefix (T < T_EPS long before f32 underflow),
    # so clamping only affects masked lanes — but keeps t_before finite
    # (inf * 0 would poison the dcol matmul with NaNs).
    t_start = t_end / jnp.maximum(total, 1e-30)
    pm_excl = _shift_right_lanes(pm, jnp.ones((P, 1), jnp.float32))
    t_before = t_start * pm_excl  # (P, CHUNK) exclusive prefix
    wmat = alpha * t_before

    g = fg_ref[0, OUT_ROWS : OUT_ROWS + 4, :]  # (4, P) composite cotangent
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

    ca = attrs[2:3, :]
    cb = attrs[3:4, :]
    cc = attrs[4:5, :]
    op = attrs[5:6, :]
    # Per-splat gradients via the pixel-moment expansion: with
    # dx = px - gx,   sum_p dsigma * dx = M1x - gx * M0, etc., where
    # M* are contractions of dsigma against the FIXED local pixel basis
    # [1, px, py, px^2, px*py, py^2]. One (6, P) x (P, CHUNK) MXU
    # contraction replaces five P-axis VPU tree-reductions (DEFAULT f32
    # precision on TPU is the 3-pass bf16 decomposition — f32-equivalent
    # accuracy); tile-local coords keep the recombination cancellation-free
    # (see _pixel_coords_local).
    basis = jnp.concatenate(
        [jnp.ones((P, 1), jnp.float32), px, py, px * px, px * py, py * py],
        axis=1,
    )  # (P, 6)
    mom = jax.lax.dot_general(
        basis, dsigma, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (6, CHUNK)
    m0 = mom[0:1, :]
    m1x = mom[1:2, :]
    m1y = mom[2:3, :]
    m2xx = mom[3:4, :]
    m2xy = mom[4:5, :]
    m2yy = mom[5:6, :]
    # Opacity gradient, analytically: wherever grad_ok holds, alpha =
    # op * e so d(alpha)/d(op) = e = alpha / op and therefore
    # sum_p dalpha * e = -sum_p dsigma / op = -M0 / op (op > 0 for every
    # real entry; pad/sentinel entries have M0 == 0).
    dop = -m0 / jnp.maximum(op, 1e-30)
    e1x = m1x - gx * m0  # = sum_p dsigma * dx
    e1y = m1y - gy * m0
    dgx = -(ca * e1x + cb * e1y)
    dgy = -(cc * e1y + cb * e1x)
    dca = 0.5 * (m2xx - 2.0 * gx * m1x + gx * gx * m0)
    dcb = m2xy - gx * m1y - gy * m1x + gx * gy * m0
    dcc = 0.5 * (m2yy - 2.0 * gy * m1y + gy * gy * m0)
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
    def fwd_attr_idx(w, bt, bf, bl, br, us):
        return (jnp.where(w < us[0], w, 0), 0, 0)

    fwd_call = pl.pallas_call(
        functools.partial(_fwd_kernel, tiles_x, chunk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(num_blocks,),
            in_specs=[
                pl.BlockSpec((1, ROWS, chunk), fwd_attr_idx),
            ],
            out_specs=pl.BlockSpec(
                (1, OUT_ROWS, P), lambda w, bt, bf, bl, br, us: (bt[w], 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((P, 128), jnp.float32),
                pltpu.VMEM((P, 128), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((num_tiles, OUT_ROWS, P), jnp.float32),
        interpret=_interpret(),
    )

    def bwd_attr_idx(w, eb, et, er, fv, nl):
        return (eb[w], 0, 0)

    def bwd_tile_idx(w, eb, et, er, fv, nl):
        return (et[w], 0, 0)

    bwd_call = pl.pallas_call(
        functools.partial(_bwd_kernel, tiles_x, chunk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(num_blocks,),
            in_specs=[
                pl.BlockSpec((1, ROWS, chunk), bwd_attr_idx),
                pl.BlockSpec((1, 2 * OUT_ROWS, P), bwd_tile_idx),
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
        return fwd_call(block_tile, block_first, block_last, block_rank, used, attrs)

    def composite_fwd(attrs, block_tile, block_first, block_last, block_rank, used):
        out = fwd_call(block_tile, block_first, block_last, block_rank, used, attrs)
        return out, (attrs, block_tile, block_last, block_rank, used, out)

    def composite_bwd(res, gout):
        attrs, block_tile, block_last, block_rank, used, fwd_out = res
        fg = jnp.concatenate([fwd_out, gout], axis=1)  # (T, 2*OUT_ROWS, P)

        # Live-block compaction: a block is dead when every pixel of its
        # tile stopped compositing before it (its entries carry zero weight
        # and zero gradient, and T/s pass through unchanged). Dead blocks
        # are a SUFFIX of each tile's depth-ordered block list, so removing
        # them keeps surviving blocks of a tile adjacent in the back-to-
        # front worklist. The kernel then pays nothing for saturated tails.
        blocks = jnp.arange(num_blocks, dtype=jnp.int32)
        # Row 6: per-pixel 1 + rank of the last CONTRIBUTING entry.
        lcmax = jnp.max(fwd_out[:, 6, :], axis=1)  # (T,)
        dead = (
            (block_rank * chunk).astype(jnp.float32) >= lcmax[block_tile]
        ) | (blocks >= used[0])
        ids_desc = num_blocks - 1 - blocks
        # Stable sort of the descending id list by deadness: live blocks
        # first, still in descending (back-to-front) order.
        perm = jnp.argsort(dead[ids_desc].astype(jnp.int32), stable=True)
        wl = ids_desc[perm]
        n_live = (num_blocks - jnp.sum(dead)).astype(jnp.int32)
        # Pin steps past n_live to the LAST live block: the output buffer
        # never switches away from it, so no garbage block is ever flushed.
        tgt = wl[jnp.maximum(n_live - 1, 0)]
        in_live = blocks < n_live
        eb = jnp.where(in_live, wl, tgt).astype(jnp.int32)
        et = block_tile[eb]
        er = block_rank[eb]
        fv = jnp.where(
            in_live,
            jnp.concatenate(
                [jnp.ones((1,), jnp.int32), (et[1:] != et[:-1]).astype(jnp.int32)]
            ),
            0,
        )
        dattrs = bwd_call(eb, et, er, fv, n_live.reshape(1), attrs, fg)
        # Dead blocks' dattrs slots were never written — zero them before
        # the gather transpose scatter-adds them into real splat rows.
        dattrs = jnp.where(dead[:, None, None], 0.0, dattrs)
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
    per_splat = _gather_attr_rows(
        jnp.concatenate(
            [
                xys,
                conics,
                opacities.reshape(-1, 1),
                ecol,
                jnp.zeros((n, ROWS - 10), xys.dtype),
            ],
            axis=1,
        ).astype(jnp.float32),
        bins.order,
    )
    table = jnp.concatenate([per_splat, jnp.zeros((1, ROWS), jnp.float32)])
    safe = jnp.where(ids < 0, n, ids)
    attr_cols = _gather_attr_rows(table, safe)
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
