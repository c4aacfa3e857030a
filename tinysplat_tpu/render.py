"""Full differentiable render pipeline: project -> SH -> composite.

TPU-native re-design of the reference's ``GaussianRasterizer.__call__``
(/root/reference/tinysplat/splatting/rasterize.py:26-62) with two structural
improvements:

1. **Fused RGB+D**: the reference rasterizes twice (RGB at rasterize.py:44,
   depth-as-color at :47-51, doubling the compositing cost). We composite a
   4-channel color [r, g, b, depth] in one pass; the depth channel's
   background is background[0], matching the reference's reuse of the RGB
   background vector for the depth pass (rasterize.py:86) where channel 0 is
   kept (rasterize.py:51).
2. **xys gradient probe**: densification needs dL/d(screen xy)
   (reference retains the grad on the CUDA tensor, rasterize.py:33-34 /
   model_gaussian.py:130-132). In JAX we thread an explicit zero-valued
   ``xys_probe`` input added to the projected centers; its gradient *is* the
   screen-space gradient.

Rasterizer backends:
  'dense'  — O(N*P) oracle (tests / tiny scenes), ops/rasterize_dense.py
  'tiled'  — binned + chunked XLA rasterizer, ops/rasterize.py
  'pallas' — Pallas TPU kernels, ops/rasterize_pallas.py
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .cameras import CameraParams
from .models.gaussians import GaussianParams
from .ops.projection import COV2D_BLUR, project_gaussians
from .ops.sh import eval_sh


def antialias_compensation(conics: jax.Array) -> jax.Array:
    """Mip-Splatting opacity compensation sqrt(det Σ / det(Σ + blur·I)).

    ``conics`` (..., 3) is the inverse of the BLURRED 2D covariance
    (projection adds COV2D_BLUR·I, ops/projection.py:154-156), exactly the
    classic-3DGS dilation that biases opacity for sub-pixel splats. The
    Mip-Splatting / modern-gsplat ``antialiased`` mode cancels that bias by
    scaling opacity with the determinant ratio of the pre-blur to blurred
    covariance. Both determinants are recoverable from the conic alone
    (Σ = adj(conic)/det(conic)), so the correction is a cheap (N,)-column
    epilogue outside the fused projection kernel and its gradient rides the
    existing conic VJP. Beyond-reference feature: the legacy gsplat API the
    reference uses (rasterize.py:32) has no antialiased mode.
    """
    a, b, c = conics[..., 0], conics[..., 1], conics[..., 2]
    det_conic = a * c - b * b  # = 1 / det(Σ_blur); > 0 for valid splats
    safe = jnp.maximum(det_conic, 1e-12)
    # det(Σ_blur - blur·I) via Σ_blur = [[c, -b], [-b, a]] / det_conic.
    det_orig = (c / safe - COV2D_BLUR) * (a / safe - COV2D_BLUR) - (b / safe) ** 2
    ratio = det_orig * safe  # det_orig / det_blur
    # Clip floor must stay ABOVE zero: for needle splats det_orig is a
    # difference of same-magnitude f32 terms and rounds negative ~half the
    # time; sqrt'(0) = inf would then meet the clip's zero cotangent as
    # inf * 0 = NaN and poison the conic/means gradients. With a positive
    # floor the clamp's gradient is exactly 0 and sqrt is finite.
    comp = jnp.sqrt(jnp.clip(ratio, 1e-8, 1.0))
    return jnp.where(det_conic > 0, comp, 0.0)


def resolve_rasterizer(name: str) -> str:
    """'auto' -> the fast path for the current backend: the Pallas kernels
    on TPU, the chunk-scanned XLA rasterizer elsewhere (CPU tests exercise
    the Pallas path explicitly via interpret mode)."""
    if name in ("auto", ""):
        return "pallas" if jax.default_backend() == "tpu" else "tiled"
    return name


def compute_viewdirs(
    means: jax.Array, camera: CameraParams, mode: str = "reference"
) -> jax.Array:
    """Per-splat unit view directions for SH evaluation.

    mode='reference' replicates rasterize.py:77-79, which uses the view
    matrix's translation column (-R @ p) as the "camera position" — not the
    actual camera center. Self-consistent within the reference ecosystem (SH
    coefficients are trained under it), so it is the default for parity.
    mode='position' uses the true camera center.
    """
    if mode == "reference":
        origin = camera.viewmat[:3, 3]
    elif mode == "position":
        origin = camera.cam_pos
    else:
        raise ValueError(mode)
    dirs = means - origin
    return dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)


def render(
    params: GaussianParams,
    alive: jax.Array,
    camera: CameraParams,
    img_height: int,
    img_width: int,
    active_sh_degree,
    background: jax.Array,
    rasterizer: str = "auto",
    xys_probe: Optional[jax.Array] = None,
    viewdirs_mode: str = "reference",
    tile_size: int = 16,
    dup_capacity: int = 0,
    max_per_tile: int = 0,
    span_capacity: int = 0,
    grad_reduce: str = "scatter",
    chunk: int = 128,  # pallas-only (DMA window); tiled has its own scan chunk
    tiles_per_block: int = 8,
    tile_x: int = 0,  # pallas-only tile WIDTH (default tile_size; height 16)
    antialiased: bool = False,
    row_stride: int = 1,
    row_offset=0,
    proj_height: int = 0,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Render an (H, W, 3) image (+ extras) from Gaussian parameters.

    Pipeline mirrors rasterize.py:26-62: EWA projection, SH color eval with
    +0.5 shift and >=0 clamp (rasterize.py:39), sigmoid opacities
    (rasterize.py:86), fused RGB+D compositing, final RGB clamp <= 1
    (rasterize.py:45).

    Band rendering (``row_stride`` S > 1): renders only the interleaved
    global 16px tile rows {row_offset, row_offset + S, ...} of a
    ``proj_height``-tall image into an (img_height, W) band — the exact
    per-device workload of the sharded step's 'tile' axis
    (parallel/train_step.py step 4); projection and intrinsics use the FULL
    image height (``proj_height``, default img_height).

    Returns:
      rgb (H, W, 3) and extras dict with 'depth' (H, W), 'alpha' (H, W),
      'radii' (C,), 'xys' (C, 2), 'camera' dims — the same keys the training
      loop consumes (reference scripts/train.py:66-102).
    """
    ph = proj_height or img_height
    proj = project_gaussians(
        means=params.means,
        scales=jnp.exp(params.scales),
        glob_scale=1.0,
        quats=params.quats,
        viewmat=camera.viewmat,
        full_projmat=camera.projmat @ camera.viewmat,
        fx=camera.fx,
        fy=camera.fy,
        cx=img_width / 2.0 + camera.cx_off,
        cy=ph / 2.0 + camera.cy_off,
        img_height=ph,
        img_width=img_width,
        tile_size=tile_size,
    )
    xys = proj.xys
    if xys_probe is not None:
        xys = xys + xys_probe

    viewdirs = compute_viewdirs(params.means, camera, viewdirs_mode)
    rgbs = eval_sh(active_sh_degree, viewdirs, params.sh_coeffs())
    rgbs = jnp.maximum(rgbs + 0.5, 0.0)

    opacities = jax.nn.sigmoid(params.opacities.reshape(-1))
    if antialiased:
        opacities = opacities * antialias_compensation(proj.conics)
    valid = proj.valid & alive

    colors4 = jnp.concatenate([rgbs, proj.depths[:, None]], axis=-1)
    bg4 = jnp.concatenate([background, background[:1]], axis=-1)

    diag = None
    rasterizer = resolve_rasterizer(rasterizer)
    if rasterizer == "dense":
        from .ops.rasterize_dense import rasterize_dense

        assert row_stride == 1, "dense oracle has no banding path"
        img4, alpha = rasterize_dense(
            xys, proj.depths, proj.conics, colors4, opacities, valid,
            img_height, img_width, bg4,
        )
    elif rasterizer == "tiled":
        from .ops.rasterize import rasterize_tiled

        img4, alpha, diag = rasterize_tiled(
            xys, proj.depths, proj.radii, proj.conics, colors4, opacities, valid,
            img_height, img_width, bg4, tile_size=tile_size,
            dup_capacity=dup_capacity, max_per_tile=max_per_tile,
            span_capacity=span_capacity,
            row_stride=row_stride, row_offset=row_offset,
            return_diagnostics=True,
        )
    elif rasterizer == "pallas":
        from .ops.rasterize_pallas import rasterize_pallas

        img4, alpha, diag = rasterize_pallas(
            xys, proj.depths, proj.radii, proj.conics, colors4, opacities, valid,
            img_height, img_width, bg4,
            dup_capacity=dup_capacity, max_per_tile=max_per_tile,
            span_capacity=span_capacity, grad_reduce=grad_reduce,
            chunk=chunk, tiles_per_block=tiles_per_block, tile_x=tile_x,
            row_stride=row_stride, row_offset=row_offset,
            return_diagnostics=True, tile_size=tile_size,
        )
    else:
        raise ValueError(f"Unknown rasterizer backend: {rasterizer}")

    rgb = jnp.minimum(img4[..., :3], 1.0)
    depth = img4[..., 3]
    extras = {
        "depth": depth,
        "alpha": alpha,
        "radii": proj.radii,
        "xys": xys,
        "depths": proj.depths,
        "camera": {"height": img_height, "width": img_width},
    }
    if diag is not None:
        extras["binning"] = diag
    return rgb, extras
