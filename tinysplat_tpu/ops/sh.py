"""Spherical-harmonics color evaluation (pure JAX, differentiable).

Replaces the external CUDA ``gsplat.sh.spherical_harmonics`` used by the
reference at /root/reference/tinysplat/splatting/rasterize.py:36-39. Standard
real SH bases up to degree 4 (25 coefficients), same basis ordering and
constants as gsplat so that checkpoints/PLY exports are interchangeable.

Design note (TPU): the evaluation is a per-splat polynomial in the view
direction — pure VPU work that XLA fuses into the projection pass. The active
degree is a *traced* int: bands above it are masked with ``jnp.where`` so the
train step stays a single compiled executable while the degree ramps up every
``--sh-increment-interval`` steps (reference scripts/train.py:49-50).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Y_l^m normalization constants (same values as gsplat's sh.cu / sh.py).
SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
SH_C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)
SH_C4 = (
    2.5033429417967046,
    -1.7701307697799304,
    0.9461746957575601,
    -0.6690465435572892,
    0.10578554691520431,
    -0.6690465435572892,
    0.47308734787878004,
    -1.7701307697799304,
    0.6258357354491761,
)


def num_sh_bases(degree: int) -> int:
    """(degree + 1)^2 — gsplat ``num_sh_bases`` semantics (degree <= 4)."""
    return (degree + 1) ** 2


def deg_from_sh(num_bases: int) -> int:
    """Inverse of :func:`num_sh_bases`; gsplat ``deg_from_sh`` semantics.

    Exact match only: a non-square basis count (e.g. a malformed
    checkpoint's colors_rest) must fail HERE with a clear error, not as a
    broadcast mismatch deep inside the jitted train step."""
    for deg in range(5):
        if num_sh_bases(deg) == num_bases:
            return deg
    raise ValueError(
        f"Unsupported number of SH bases: {num_bases} (must be one of "
        f"1, 4, 9, 16, 25)")


def sh_basis(dirs: jax.Array, num_bases: int) -> jax.Array:
    """Evaluate the real SH basis functions for unit directions.

    Args:
      dirs: (..., 3) unit view directions.
      num_bases: static number of bases (1, 4, 9, 16 or 25).

    Returns:
      (..., num_bases) basis values.
    """
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    out = [jnp.full(x.shape, SH_C0, dtype=dirs.dtype)]
    if num_bases > 1:
        out += [-SH_C1 * y, SH_C1 * z, -SH_C1 * x]
    if num_bases > 4:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [
            SH_C2[0] * xy,
            SH_C2[1] * yz,
            SH_C2[2] * (2.0 * zz - xx - yy),
            SH_C2[3] * xz,
            SH_C2[4] * (xx - yy),
        ]
    if num_bases > 9:
        out += [
            SH_C3[0] * y * (3.0 * xx - yy),
            SH_C3[1] * xy * z,
            SH_C3[2] * y * (4.0 * zz - xx - yy),
            SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            SH_C3[4] * x * (4.0 * zz - xx - yy),
            SH_C3[5] * z * (xx - yy),
            SH_C3[6] * x * (xx - 3.0 * yy),
        ]
    if num_bases > 16:
        out += [
            SH_C4[0] * xy * (xx - yy),
            SH_C4[1] * yz * (3.0 * xx - yy),
            SH_C4[2] * xy * (7.0 * zz - 1.0),
            SH_C4[3] * yz * (7.0 * zz - 3.0),
            SH_C4[4] * (zz * (35.0 * zz - 30.0) + 3.0),
            SH_C4[5] * xz * (7.0 * zz - 3.0),
            SH_C4[6] * (xx - yy) * (7.0 * zz - 1.0),
            SH_C4[7] * xz * (xx - 3.0 * yy),
            SH_C4[8] * (xx * (xx - 3.0 * yy) - yy * (3.0 * xx - yy)),
        ]
    return jnp.stack(out, axis=-1)


def band_of_basis(num_bases: int) -> jax.Array:
    """Static (num_bases,) int array: SH band (degree) of each basis index."""
    bands = []
    for deg in range(5):
        bands += [deg] * (2 * deg + 1)
    return jnp.asarray(bands[:num_bases], dtype=jnp.int32)


def eval_sh(active_degree: jax.Array, dirs: jax.Array, coeffs: jax.Array) -> jax.Array:
    """Evaluate SH colors: sum_k basis_k(dir) * coeffs[..., k, :].

    Semantics of the CUDA ``spherical_harmonics(degree, viewdirs, coeffs)``
    call at /root/reference/tinysplat/splatting/rasterize.py:38. Bases above
    ``active_degree`` (traced int) are masked to zero, so the number of bases
    used can ramp without recompilation.

    Args:
      active_degree: traced or static int, current SH degree in [0, 4].
      dirs: (N, 3) unit view directions.
      coeffs: (N, K, 3) SH coefficients with K the *max* number of bases.

    Returns:
      (N, 3) raw SH colors (caller applies the +0.5 shift and clamping,
      reference rasterize.py:39).
    """
    num_bases = coeffs.shape[-2]
    basis = sh_basis(dirs, num_bases)  # (N, K)
    mask = band_of_basis(num_bases) <= jnp.asarray(active_degree, dtype=jnp.int32)
    basis = jnp.where(mask, basis, 0.0)
    return jnp.einsum("...k,...kc->...c", basis, coeffs)
