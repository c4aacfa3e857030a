"""Dense reference rasterizer: O(N * pixels) alpha compositing (pure JAX).

This is the *numerical oracle* for the framework: a direct, fully
differentiable implementation of the tile-based CUDA compositing that the
reference delegates to ``gsplat.rasterize_gaussians``
(/root/reference/tinysplat/splatting/rasterize.py:44,50). It evaluates every
splat at every pixel — intended for tests and tiny scenes only; production
rendering uses the binned/chunked rasterizers in ``rasterize.py`` /
``rasterize_pallas.py`` which must match this module to tight tolerances.

Compositing semantics replicated (gsplat legacy forward kernel):
  per pixel, splats front-to-back by camera depth:
    sigma = 0.5*(a*dx^2 + c*dy^2) + b*dx*dy        (conic = [a, b, c])
    alpha = min(0.999, opacity * exp(-sigma));  skipped if alpha < 1/255
    composite while transmittance T stays > 1e-4; background blended with
    the residual transmittance.

The CUDA kernel's sticky early-exit ("stop before the first splat whose
compositing would push T <= 1e-4") is reproduced *exactly* without any
sequential done-flag: the inclusive transmittance product t_incl[k] =
prod_{j<=k}(1 - alpha_j) is nonincreasing, so `t_incl[k] > 1e-4` is precisely
the CUDA condition `next_T > 1e-4` for every splat up to the break point and
false for every splat after it. Compositing therefore reduces to a cumulative
product + masked matmul — differentiable, vectorizable, MXU-friendly.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

ALPHA_EPS = 1.0 / 255.0
ALPHA_MAX = 0.999
T_EPS = 1e-4


def sort_by_depth(depths: jax.Array, valid: jax.Array) -> jax.Array:
    """Front-to-back splat order; invalid splats sorted last.

    Ties broken by splat index (via stable sort) so that the order — and thus
    the composited image — is deterministic and identical across shardings
    (SURVEY.md section 7 'sorted-order determinism').
    """
    key = jnp.where(valid, depths, jnp.inf)
    return jnp.argsort(key, stable=True)


def alpha_matrix(
    px: jax.Array,
    xys: jax.Array,
    conics: jax.Array,
    opacities: jax.Array,
    valid: jax.Array,
) -> jax.Array:
    """Per pixel-splat alpha: (P, S) from (P, 2) pixels and (S,) splat attrs."""
    dx = px[:, 0:1] - xys[None, :, 0]  # (P, S)
    dy = px[:, 1:2] - xys[None, :, 1]
    a, b, c = conics[None, :, 0], conics[None, :, 1], conics[None, :, 2]
    sigma = 0.5 * (a * dx * dx + c * dy * dy) + b * dx * dy
    alpha = jnp.minimum(ALPHA_MAX, opacities[None, :] * jnp.exp(-sigma))
    keep = (sigma >= 0.0) & (alpha >= ALPHA_EPS) & valid[None, :]
    return jnp.where(keep, alpha, 0.0)


def composite(alpha: jax.Array, colors: jax.Array, background: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Front-to-back alpha compositing over the splat axis.

    Args:
      alpha: (P, S) per pixel-splat alphas, already in front-to-back order.
      colors: (S, C) per-splat colors.
      background: (C,) blended with the residual transmittance.

    Returns:
      (P, C) composited image and (P,) final transmittance.
    """
    one_minus = 1.0 - alpha
    # Inclusive / exclusive cumulative transmittance products.
    t_incl = jnp.cumprod(one_minus, axis=1)  # T after compositing splat k
    t_excl = jnp.concatenate([jnp.ones_like(t_incl[:, :1]), t_incl[:, :-1]], axis=1)
    # Splat k is composited iff the post-composite transmittance stays above
    # T_EPS — exactly the CUDA early-exit rule (see module docstring).
    live = t_incl > T_EPS
    weights = jnp.where(live, alpha * t_excl, 0.0)
    out = weights @ colors
    # Final transmittance: after the last composited splat — i.e. the largest
    # t_incl among live splats, or 1 if nothing composited. Because t_incl is
    # nonincreasing and `live` is a prefix, this is min over live of t_incl.
    t_final = jnp.min(jnp.where(live, t_incl, jnp.ones_like(t_incl)), axis=1)
    return out + t_final[:, None] * background[None, :], t_final


def pixel_grid(img_height: int, img_width: int, dtype=jnp.float32) -> jax.Array:
    """(H*W, 2) pixel coordinates (x, y), row-major, matching gsplat's
    pixel-center convention (splat center xys already carries the -0.5)."""
    ys = jnp.arange(img_height, dtype=dtype)
    xs = jnp.arange(img_width, dtype=dtype)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)


def rasterize_dense(
    xys: jax.Array,
    depths: jax.Array,
    conics: jax.Array,
    colors: jax.Array,
    opacities: jax.Array,
    valid: jax.Array,
    img_height: int,
    img_width: int,
    background: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Rasterize N splats to an (H, W, C) image + (H, W) alpha map.

    Signature mirrors the CUDA ``rasterize_gaussians`` call at
    /root/reference/tinysplat/splatting/rasterize.py:83-86 (opacities already
    sigmoided); ``colors`` may carry extra channels — the RGB+D fused path
    renders C=4 in one pass instead of the reference's two rasterize calls
    (rasterize.py:44-51).
    """
    order = sort_by_depth(depths, valid)
    xys_s = xys[order]
    conics_s = conics[order]
    colors_s = colors[order]
    opac_s = opacities.reshape(-1)[order]
    valid_s = valid[order]

    px = pixel_grid(img_height, img_width, dtype=xys.dtype)
    alpha = alpha_matrix(px, xys_s, conics_s, opac_s, valid_s)
    out, t_final = composite(alpha, colors_s, background)
    img = out.reshape(img_height, img_width, -1)
    alpha_img = (1.0 - t_final).reshape(img_height, img_width)
    return img, alpha_img
