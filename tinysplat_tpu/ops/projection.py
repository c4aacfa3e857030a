"""EWA splat projection: 3D Gaussians -> 2D screen-space conics (pure JAX).

Replaces the external CUDA ``gsplat.project_gaussians`` used by the reference
at /root/reference/tinysplat/splatting/rasterize.py:32 (inputs assembled at
rasterize.py:64-73). Semantics replicated:

  Sigma_3D = R S S^T R^T from quaternion + (already exponentiated) scales;
  camera transform by viewmat; perspective Jacobian with FOV-clamped t.x/t.y
  (EWA stability); Sigma_2D = J W Sigma W^T J^T + 0.3*I low-pass blur;
  conic = Sigma_2D^{-1}; radius = ceil(3 * sqrt(max eigenvalue)); screen xy
  via the full projection matrix and ndc->pixel mapping; per-splat 16x16-tile
  count vs tile bounds (rasterize.py:88-94).

This is pure per-splat VPU work — one fused XLA computation, embarrassingly
parallel over the (optionally sharded) splat axis, and differentiable w.r.t.
means / scales / quats end to end (the custom backward lives in the
compositing kernel, not here; XLA's autodiff through this module is already
optimal since everything is elementwise + tiny fixed-size matmuls).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..utils.quaternions import quat_to_rotmat

# Low-pass blur added to the projected 2D covariance (gsplat/inria constant).
COV2D_BLUR = 0.3
# Near-plane clip threshold for the projection (gsplat `clip_thresh` default).
CLIP_THRESH = 0.01


class ProjectedGaussians(NamedTuple):
    """Per-splat screen-space quantities (all leading dim N)."""

    xys: jax.Array  # (N, 2) pixel-space centers
    depths: jax.Array  # (N,) camera-space z
    radii: jax.Array  # (N,) int32 3-sigma pixel radius (0 = culled)
    conics: jax.Array  # (N, 3) upper-triangular inverse 2D covariance (a, b, c)
    num_tiles_hit: jax.Array  # (N,) int32 count of 16x16 tiles overlapped
    valid: jax.Array  # (N,) bool — in front of near plane & invertible cov


def scale_rot_to_cov3d(scales: jax.Array, glob_scale: float, quats: jax.Array) -> jax.Array:
    """Sigma = (R S)(R S)^T with S = diag(glob_scale * scales). (N, 3, 3)."""
    R = quat_to_rotmat(quats)  # (N, 3, 3)
    M = R * (glob_scale * scales)[..., None, :]  # scale columns
    return M @ jnp.swapaxes(M, -1, -2)


def project_cov3d_ewa(
    means_cam: jax.Array,
    cov3d: jax.Array,
    viewmat_rot: jax.Array,
    fx: jax.Array,
    fy: jax.Array,
    tan_fovx: jax.Array,
    tan_fovy: jax.Array,
) -> jax.Array:
    """Project 3D covariances to 2D screen space (EWA). Returns (N, 2, 2).

    The camera-space x/z and y/z ratios are clamped to 1.3 * tan(fov/2) when
    building the Jacobian, matching gsplat's EWA implementation (numerical
    stability at the image border).
    """
    tx, ty, tz = means_cam[..., 0], means_cam[..., 1], means_cam[..., 2]
    tz = jnp.where(jnp.abs(tz) < 1e-8, 1e-8, tz)
    lim_x = 1.3 * tan_fovx
    lim_y = 1.3 * tan_fovy
    txz = jnp.clip(tx / tz, -lim_x, lim_x)
    tyz = jnp.clip(ty / tz, -lim_y, lim_y)
    tx = txz * tz
    ty = tyz * tz

    rz = 1.0 / tz
    rz2 = rz * rz
    zeros = jnp.zeros_like(tz)
    # J: (N, 2, 3) perspective Jacobian
    j_row0 = jnp.stack([fx * rz, zeros, -fx * tx * rz2], axis=-1)
    j_row1 = jnp.stack([zeros, fy * rz, -fy * ty * rz2], axis=-1)
    J = jnp.stack([j_row0, j_row1], axis=-2)

    T = J @ viewmat_rot  # (N, 2, 3)
    cov2d = T @ cov3d @ jnp.swapaxes(T, -1, -2)  # (N, 2, 2)
    return cov2d + COV2D_BLUR * jnp.eye(2, dtype=cov2d.dtype)


def ndc2pix(ndc: jax.Array, size, center) -> jax.Array:
    """NDC [-1, 1] -> pixel coordinate; gsplat legacy convention."""
    return 0.5 * size * ndc + center - 0.5


def project_gaussians(
    means: jax.Array,
    scales: jax.Array,
    glob_scale: float,
    quats: jax.Array,
    viewmat: jax.Array,
    full_projmat: jax.Array,
    fx,
    fy,
    cx,
    cy,
    img_height: int,
    img_width: int,
    tile_size: int = 16,
    clip_thresh: float = CLIP_THRESH,
) -> ProjectedGaussians:
    """Project N 3D Gaussians to screen space.

    Mirrors the CUDA ``project_gaussians`` signature reconstructed from the
    reference call site (/root/reference/tinysplat/splatting/rasterize.py:73):
    ``scales`` are already exponentiated, ``quats`` need not be pre-normalized
    (normalization happens inside via quat_to_rotmat), ``viewmat`` may be
    (3, 4) or (4, 4), ``full_projmat`` = projmat @ viewmat (4, 4).
    """
    dtype = means.dtype
    fx = jnp.asarray(fx, dtype)
    fy = jnp.asarray(fy, dtype)
    tan_fovx = 0.5 * img_width / fx
    tan_fovy = 0.5 * img_height / fy

    W_rot = viewmat[:3, :3]
    t_vec = viewmat[:3, 3]
    means_cam = means @ W_rot.T + t_vec  # (N, 3)
    depths = means_cam[..., 2]
    in_front = depths > clip_thresh

    cov3d = scale_rot_to_cov3d(scales, glob_scale, quats)  # (N, 3, 3)
    cov2d = project_cov3d_ewa(means_cam, cov3d, W_rot, fx, fy, tan_fovx, tan_fovy)

    a = cov2d[..., 0, 0]
    b = cov2d[..., 0, 1]
    c = cov2d[..., 1, 1]
    det = a * c - b * b
    invertible = det > 0.0
    det_safe = jnp.where(invertible, det, 1.0)
    inv_det = 1.0 / det_safe
    conics = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=-1)

    # 3-sigma pixel radius from the larger eigenvalue of cov2d.
    half_trace = 0.5 * (a + c)
    disc = jnp.sqrt(jnp.maximum(0.1, half_trace * half_trace - det))
    lambda_max = half_trace + disc
    radii_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda_max, 0.0)))

    # Screen-space centers via full projection.
    ones = jnp.ones_like(depths)
    hom = jnp.concatenate([means, ones[..., None]], axis=-1) @ full_projmat.T
    rw = 1.0 / jnp.maximum(jnp.abs(hom[..., 3]), 1e-6) * jnp.sign(hom[..., 3] + 1e-30)
    xys = jnp.stack(
        [
            ndc2pix(hom[..., 0] * rw, jnp.asarray(img_width, dtype), jnp.asarray(cx, dtype)),
            ndc2pix(hom[..., 1] * rw, jnp.asarray(img_height, dtype), jnp.asarray(cy, dtype)),
        ],
        axis=-1,
    )

    valid = in_front & invertible
    radii = jnp.where(valid, radii_f, 0.0).astype(jnp.int32)

    # Tile overlap counts vs the ceil(W/16) x ceil(H/16) grid
    # (reference tile_bounds: rasterize.py:88-94).
    tiles_x = (img_width + tile_size - 1) // tile_size
    tiles_y = (img_height + tile_size - 1) // tile_size
    bx0, bx1, by0, by1 = tile_ranges(xys, radii, tiles_x, tiles_y, tile_size)
    num_tiles_hit = jnp.where(valid, (bx1 - bx0) * (by1 - by0), 0).astype(jnp.int32)

    return ProjectedGaussians(
        xys=xys,
        depths=depths,
        radii=radii,
        conics=conics,
        num_tiles_hit=num_tiles_hit,
        valid=valid,
    )


def tile_ranges(
    xys: jax.Array,
    radii: jax.Array,
    tiles_x: int,
    tiles_y: int,
    tile_size: int = 16,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Inclusive-exclusive tile index ranges covered by each splat's AABB."""
    r = radii.astype(xys.dtype)
    x, y = xys[..., 0], xys[..., 1]
    # floor (not truncation) so fully off-screen splats clip to empty ranges.
    bx0 = jnp.clip(jnp.floor((x - r) / tile_size).astype(jnp.int32), 0, tiles_x)
    bx1 = jnp.clip(jnp.floor((x + r) / tile_size).astype(jnp.int32) + 1, 0, tiles_x)
    by0 = jnp.clip(jnp.floor((y - r) / tile_size).astype(jnp.int32), 0, tiles_y)
    by1 = jnp.clip(jnp.floor((y + r) / tile_size).astype(jnp.int32) + 1, 0, tiles_y)
    # Culled splats (radius 0) cover no tiles.
    empty = radii <= 0
    bx1 = jnp.where(empty, bx0, bx1)
    by1 = jnp.where(empty, by0, by1)
    return bx0, bx1, by0, by1
