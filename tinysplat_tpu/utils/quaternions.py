"""Quaternion utilities (pure JAX).

Conventions follow the reference framework (quaternions stored as (w, x, y, z)):
- batched quat -> rotation matrix: /root/reference/tinysplat/utils.py:42-73
- scalar quat -> rotation matrix (camera pose): /root/reference/tinysplat/utils.py:29-39
- random quaternion init: /root/reference/tinysplat/utils.py:15-27

Both reference functions implement the same standard R(q) for q=(w,x,y,z); we
provide a single batched implementation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def normalize_quat(quats: jax.Array, eps: float = 1e-12) -> jax.Array:
    """L2-normalize quaternions along the last axis."""
    norm = jnp.linalg.norm(quats, axis=-1, keepdims=True)
    return quats / jnp.maximum(norm, eps)


def quat_to_rotmat(quats: jax.Array) -> jax.Array:
    """Convert (..., 4) quaternions (w, x, y, z) to (..., 3, 3) rotation matrices.

    Quaternions are normalized internally (matching the reference's
    ``quat_to_rot_tensor``, /root/reference/tinysplat/utils.py:42-73).
    """
    q = normalize_quat(quats)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    row0 = jnp.stack([r00, r01, r02], axis=-1)
    row1 = jnp.stack([r10, r11, r12], axis=-1)
    row2 = jnp.stack([r20, r21, r22], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def quat_to_rotmat_np(quat: np.ndarray) -> np.ndarray:
    """Numpy single-quaternion variant for host-side camera pose math.

    Semantics of /root/reference/tinysplat/utils.py:29-39, plus
    normalization: COLMAP qvecs are unit, but this also receives viewer
    websocket quats (JS slerp drifts off the unit sphere) — an
    unnormalized q would build a scaled, sheared 'rotation'.
    """
    n = float(np.linalg.norm(np.asarray(quat, np.float64)))
    if not np.isfinite(n) or n < 1e-12:
        raise ValueError(f"degenerate quaternion (norm {n})")
    quat = np.asarray(quat, np.float64) / n
    q0, q1, q2, q3 = float(quat[0]), float(quat[1]), float(quat[2]), float(quat[3])
    return np.asarray(
        [
            [1 - 2 * q2**2 - 2 * q3**2, 2 * q1 * q2 - 2 * q3 * q0, 2 * q1 * q3 + 2 * q2 * q0],
            [2 * q1 * q2 + 2 * q3 * q0, 1 - 2 * q1**2 - 2 * q3**2, 2 * q2 * q3 - 2 * q1 * q0],
            [2 * q1 * q3 - 2 * q2 * q0, 2 * q2 * q3 + 2 * q1 * q0, 1 - 2 * q1**2 - 2 * q2**2],
        ]
    )


def random_quats(key: jax.Array, n: int, dtype=jnp.float32) -> jax.Array:
    """Uniformly random unit quaternions, (n, 4), (w, x, y, z).

    Marsaglia construction, matching /root/reference/tinysplat/utils.py:15-27.
    """
    ku, kv, kw = jax.random.split(key, 3)
    u = jax.random.uniform(ku, (n,), dtype=dtype)
    v = jax.random.uniform(kv, (n,), dtype=dtype)
    w = jax.random.uniform(kw, (n,), dtype=dtype)
    two_pi = 2.0 * jnp.pi
    return jnp.stack(
        [
            jnp.sqrt(1.0 - u) * jnp.sin(two_pi * v),
            jnp.sqrt(1.0 - u) * jnp.cos(two_pi * v),
            jnp.sqrt(u) * jnp.sin(two_pi * w),
            jnp.sqrt(u) * jnp.cos(two_pi * w),
        ],
        axis=-1,
    )
