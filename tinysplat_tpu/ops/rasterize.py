"""Tiled rasterizer: binned, chunk-scanned alpha compositing (pure XLA).

The production-scale differentiable rasterizer (the Pallas kernels in
``rasterize_pallas.py`` are a further-fused drop-in). Replaces the CUDA
``rasterize_gaussians`` fwd+bwd pair used by the reference
(/root/reference/tinysplat/splatting/rasterize.py:44,50) with a TPU-shaped
computation:

- pixels are grouped into the same 16x16 tiles as the binning grid
  (reference tile layout, rasterize.py:19-20);
- each tile walks its depth-sorted splat list in chunks of ``chunk`` splats
  under ``lax.scan``; per chunk, alphas for (tiles, chunk, pixels) are pure
  VPU work, and compositing reduces to an exclusive cumulative product along
  the chunk plus one batched (chunk x pixels)^T @ (chunk x channels) matmul —
  MXU work;
- the scan carries per-pixel transmittance between chunks, reproducing the
  sequential front-to-back semantics of ``rasterize_dense`` exactly (same
  early-exit rule via the monotone t-product, see that module's docstring);
- the chunk body is wrapped in ``jax.checkpoint``: backward recomputes each
  chunk's alphas instead of storing O(tiles*chunk*pixels) residuals, keeping
  HBM footprint at one chunk.

Gradients flow to xys/conics/colors/opacities through the differentiable
gathers (their transpose is a scatter-add over the splat axis); the integer
binning structure is constant w.r.t. parameters, exactly like the CUDA
kernel's sorted index buffers.
"""
from __future__ import annotations

import functools
import jax
import jax.numpy as jnp

from .binning import bin_splats
from .rasterize_dense import ALPHA_EPS, ALPHA_MAX, T_EPS


def _tile_pixel_coords(tiles_x: int, tiles_y: int, tile_size: int, dtype,
                       row_stride: int = 1, row_offset=0) -> jax.Array:
    """(num_tiles, tile_size^2, 2) pixel (x, y) coordinates per tile.

    With strided banding (row_stride S, row_offset o), local tile row g
    covers GLOBAL pixel rows [(o + g*S) * tile_size, ...) — see
    binning._sorted_intersections.
    """
    t = jnp.arange(tiles_x * tiles_y)
    tx = (t % tiles_x).astype(dtype) * tile_size
    row = t // tiles_x
    if row_stride != 1:
        row = row * row_stride + jnp.asarray(row_offset, row.dtype)
    ty = row.astype(dtype) * tile_size
    py, px = jnp.meshgrid(
        jnp.arange(tile_size, dtype=dtype), jnp.arange(tile_size, dtype=dtype), indexing="ij"
    )
    local = jnp.stack([px.reshape(-1), py.reshape(-1)], axis=-1)  # (P, 2)
    origin = jnp.stack([tx, ty], axis=-1)  # (T, 2)
    return origin[:, None, :] + local[None, :, :]


def rasterize_tiled(
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
    tile_size: int = 16,
    chunk: int = 32,
    dup_capacity: int = 0,
    max_per_tile: int = 0,
    span_capacity: int = 0,
    row_stride: int = 1,
    row_offset=0,
    return_diagnostics: bool = False,
):
    """Rasterize to (H, W, C) image + (H, W) alpha; dense-oracle semantics.

    With return_diagnostics, also returns {'intersections', 'dup_dropped',
    'tile_dropped'} device scalars (budget auto-tuning; fetch
    asynchronously).
    """
    tiles_x = (img_width + tile_size - 1) // tile_size
    tiles_y = (img_height + tile_size - 1) // tile_size
    num_tiles = tiles_x * tiles_y
    p = tile_size * tile_size
    c = colors.shape[-1]
    dtype = colors.dtype

    bins = bin_splats(
        xys, depths, radii, valid, tiles_x, tiles_y, tile_size,
        dup_capacity=dup_capacity, max_per_tile=max_per_tile,
        span_capacity=span_capacity,
        conics=conics, opacities=opacities.reshape(-1),
        row_stride=row_stride, row_offset=row_offset,
    )
    k_max = bins.idx_lists.shape[1]
    num_chunks = (k_max + chunk - 1) // chunk
    # Pad lists to a whole number of chunks.
    pad = num_chunks * chunk - k_max
    idx = jnp.pad(bins.idx_lists, ((0, 0), (0, pad)), constant_values=-1)
    # (num_chunks, T, chunk) scan order
    idx = jnp.transpose(idx.reshape(num_tiles, num_chunks, chunk), (1, 0, 2))

    # Pixel coords follow the GEOMETRY dtype (rasterize_dense.pixel_grid
    # semantics) — keying them off colors.dtype would round coordinates
    # >= 256 under bf16 colors.
    px = _tile_pixel_coords(tiles_x, tiles_y, tile_size, xys.dtype,
                            row_stride, row_offset)  # (T, P, 2)
    opac = opacities.reshape(-1)

    @functools.partial(jax.checkpoint, prevent_cse=False)
    def chunk_body(carry, ids):
        # t_raw: RAW running product over every kept alpha — monotone
        # decreasing, so the T_EPS liveness test stays permanently dead
        # across chunk boundaries (carrying only the frozen value let a
        # saturated pixel 'resurrect' when the raw product at the boundary
        # was below T_EPS but the frozen carry was above it).
        # t_frozen: transmittance frozen at death — the CUDA T the
        # background blends with. While live the two are equal, so the
        # composite weights can use the raw series.
        img_acc, t_raw, t_frozen = carry  # (T, P, C), (T, P), (T, P)
        safe = jnp.maximum(ids, 0)  # (T, chunk)
        live_id = ids >= 0
        g_xy = xys[safe]  # (T, chunk, 2)
        g_con = conics[safe]  # (T, chunk, 3)
        g_col = colors[safe]  # (T, chunk, C)
        g_op = jnp.where(live_id, opac[safe], 0.0)  # (T, chunk)

        dx = px[:, None, :, 0] - g_xy[:, :, None, 0]  # (T, chunk, P)
        dy = px[:, None, :, 1] - g_xy[:, :, None, 1]
        sigma = (
            0.5 * (g_con[:, :, None, 0] * dx * dx + g_con[:, :, None, 2] * dy * dy)
            + g_con[:, :, None, 1] * dx * dy
        )
        alpha = jnp.minimum(ALPHA_MAX, g_op[:, :, None] * jnp.exp(-sigma))
        keep = (sigma >= 0.0) & (alpha >= ALPHA_EPS)
        alpha = jnp.where(keep, alpha, 0.0)  # (T, chunk, P)

        # In-chunk cumulative transmittance, seeded by the RAW carry.
        t_incl = t_raw[:, None, :] * jnp.cumprod(1.0 - alpha, axis=1)
        t_excl = jnp.concatenate([t_raw[:, None, :], t_incl[:, :-1, :]], axis=1)
        live = t_incl > T_EPS  # exact CUDA early-exit rule (rasterize_dense doc)
        w = jnp.where(live, alpha * t_excl, 0.0)  # (T, chunk, P)

        # MXU: (T, P, chunk) @ (T, chunk, C)
        img_acc = img_acc + jnp.einsum(
            "tkp,tkc->tpc", w, g_col, preferred_element_type=jnp.float32
        )
        # Frozen carry: last LIVE inclusive transmittance (death value).
        t_frozen_next = jnp.min(
            jnp.where(live, t_incl, jnp.broadcast_to(t_frozen[:, None, :], t_incl.shape)),
            axis=1,
        )
        t_frozen_next = jnp.minimum(t_frozen_next, t_frozen)
        return (img_acc, t_incl[:, -1, :], t_frozen_next), None

    init = (
        jnp.zeros((num_tiles, p, c), jnp.float32),
        jnp.ones((num_tiles, p), jnp.float32),
        jnp.ones((num_tiles, p), jnp.float32),
    )
    (img_tiles, _, t_final), _ = jax.lax.scan(chunk_body, init, idx)
    img_tiles = img_tiles.astype(dtype) + t_final[..., None] * background[None, None, :]

    # (T, P, C) -> (H_pad, W_pad, C) -> crop
    img = img_tiles.reshape(tiles_y, tiles_x, tile_size, tile_size, c)
    img = jnp.transpose(img, (0, 2, 1, 3, 4)).reshape(
        tiles_y * tile_size, tiles_x * tile_size, c
    )
    alpha_img = 1.0 - t_final.reshape(tiles_y, tiles_x, tile_size, tile_size)
    alpha_img = jnp.transpose(alpha_img, (0, 2, 1, 3)).reshape(
        tiles_y * tile_size, tiles_x * tile_size
    )
    img_out = img[:img_height, :img_width]
    alpha_out = alpha_img[:img_height, :img_width]
    if return_diagnostics:
        diag = {
            "intersections": bins.total_intersections,
            "dup_dropped": bins.dup_overflow,
            "tile_dropped": bins.tile_overflow,
        }
        return img_out, alpha_out, diag
    return img_out, alpha_out
