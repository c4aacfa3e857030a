"""Camera ray helpers (PixelNeRF-style unprojection map).

jnp counterpart of /root/reference/tinysplat/utils.py:76-106 (itself adapted
from PixelNeRF): per-pixel unit ray directions in the camera frame.
"""
from __future__ import annotations

import jax.numpy as jnp


def unproj_map(width: int, height: int, fx, fy, cx=None, cy=None) -> jnp.ndarray:
    """(H, W, 3) unit camera-frame ray directions, -z forward convention
    (matches reference utils.py:96-106: (-X, -Y, -1) normalized)."""
    if cx is None:
        cx = width * 0.5
    if cy is None:
        cy = height * 0.5
    ys = (jnp.arange(height, dtype=jnp.float32) - cy) / fy
    xs = (jnp.arange(width, dtype=jnp.float32) - cx) / fx
    Y, X = jnp.meshgrid(ys, xs, indexing="ij")
    Z = jnp.ones_like(X)
    unproj = jnp.stack((-X, -Y, -Z), axis=-1)
    return unproj / jnp.linalg.norm(unproj, axis=-1, keepdims=True)
