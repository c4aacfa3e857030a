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


def _rotmat_elems(quats: jax.Array):
    """The 9 rotation-matrix entries as (N,) arrays (normalized quaternion).

    Scalarized form of utils.quaternions.quat_to_rotmat: XLA lowers (N, 3, 3)
    batched tiny-matrix chains into many T(4,128)-tiled fusions (~35 ms at
    N=262k on v5e); plain (N,) elementwise columns fuse into one kernel.
    """
    # Gradient-safe normalization: jnp.linalg.norm's VJP is 0/0 = NaN at a
    # zero quaternion even when the clipped PRIMAL is fine; sqrt(max(q.q,
    # eps)) has a finite gradient everywhere (dead slots must not poison
    # the quat gradient rows — the optimizer updates them unmasked).
    q = quats / jnp.sqrt(
        jnp.maximum(jnp.sum(quats * quats, axis=-1, keepdims=True), 1e-24))
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return (
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    )


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


def _cov2d_scalar(means_cam, scales_g, quats, W_rot, fx, fy, tan_fovx, tan_fovy):
    """Scalarized EWA 2D covariance: returns (a, b, c) of the symmetric 2x2.

    Same math as scale_rot_to_cov3d + project_cov3d_ewa but in (N,) column
    arithmetic — one fused elementwise kernel instead of a chain of batched
    tiny-matrix fusions (see _rotmat_elems).
    """
    r00, r01, r02, r10, r11, r12, r20, r21, r22 = _rotmat_elems(quats)
    s0, s1, s2 = scales_g[..., 0], scales_g[..., 1], scales_g[..., 2]
    # M = R diag(s); Sigma = M M^T (6 unique entries).
    m00, m01, m02 = r00 * s0, r01 * s1, r02 * s2
    m10, m11, m12 = r10 * s0, r11 * s1, r12 * s2
    m20, m21, m22 = r20 * s0, r21 * s1, r22 * s2
    sig00 = m00 * m00 + m01 * m01 + m02 * m02
    sig01 = m00 * m10 + m01 * m11 + m02 * m12
    sig02 = m00 * m20 + m01 * m21 + m02 * m22
    sig11 = m10 * m10 + m11 * m11 + m12 * m12
    sig12 = m10 * m20 + m11 * m21 + m12 * m22
    sig22 = m20 * m20 + m21 * m21 + m22 * m22

    tx, ty, tz = means_cam[..., 0], means_cam[..., 1], means_cam[..., 2]
    tz = jnp.where(jnp.abs(tz) < 1e-8, 1e-8, tz)
    tx = jnp.clip(tx / tz, -1.3 * tan_fovx, 1.3 * tan_fovx) * tz
    ty = jnp.clip(ty / tz, -1.3 * tan_fovy, 1.3 * tan_fovy) * tz
    rz = 1.0 / tz
    rz2 = rz * rz
    j00 = fx * rz
    j02 = -fx * tx * rz2
    j11 = fy * rz
    j12 = -fy * ty * rz2

    # T = J @ W (J rows have 2 nonzeros); W entries are traced scalars.
    w = W_rot
    t00 = j00 * w[0, 0] + j02 * w[2, 0]
    t01 = j00 * w[0, 1] + j02 * w[2, 1]
    t02 = j00 * w[0, 2] + j02 * w[2, 2]
    t10 = j11 * w[1, 0] + j12 * w[2, 0]
    t11 = j11 * w[1, 1] + j12 * w[2, 1]
    t12 = j11 * w[1, 2] + j12 * w[2, 2]

    # u_b = Sigma @ t_b; cov2d_ab = t_a . u_b  (+ low-pass blur on diagonal).
    u00 = sig00 * t00 + sig01 * t01 + sig02 * t02
    u01 = sig01 * t00 + sig11 * t01 + sig12 * t02
    u02 = sig02 * t00 + sig12 * t01 + sig22 * t02
    u10 = sig00 * t10 + sig01 * t11 + sig02 * t12
    u11 = sig01 * t10 + sig11 * t11 + sig12 * t12
    u12 = sig02 * t10 + sig12 * t11 + sig22 * t12

    a = t00 * u00 + t01 * u01 + t02 * u02 + COV2D_BLUR
    b = t00 * u10 + t01 * u11 + t02 * u12
    c = t10 * u10 + t11 * u11 + t12 * u12 + COV2D_BLUR
    return a, b, c


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

    a, b, c = _cov2d_scalar(
        means_cam, glob_scale * scales, quats, W_rot, fx, fy, tan_fovx, tan_fovy
    )
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
    tile_size_x: int = 0,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Inclusive-exclusive tile index ranges covered by each splat's AABB.

    ``tile_size`` is the tile HEIGHT; ``tile_size_x`` (default: same) the
    width — the Pallas rasterizer uses wider-than-tall tiles to shrink the
    intersection count every per-entry cost scales with.
    """
    tsx = tile_size_x or tile_size
    r = radii.astype(xys.dtype)
    x, y = xys[..., 0], xys[..., 1]
    # floor (not truncation) so fully off-screen splats clip to empty ranges.
    bx0 = jnp.clip(jnp.floor((x - r) / tsx).astype(jnp.int32), 0, tiles_x)
    bx1 = jnp.clip(jnp.floor((x + r) / tsx).astype(jnp.int32) + 1, 0, tiles_x)
    by0 = jnp.clip(jnp.floor((y - r) / tile_size).astype(jnp.int32), 0, tiles_y)
    by1 = jnp.clip(jnp.floor((y + r) / tile_size).astype(jnp.int32) + 1, 0, tiles_y)
    # Culled splats (radius 0) cover no tiles.
    empty = radii <= 0
    bx1 = jnp.where(empty, bx0, bx1)
    by1 = jnp.where(empty, by0, by1)
    return bx0, bx1, by0, by1
