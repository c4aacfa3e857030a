"""tinysplat-tpu: a TPU-native 3D Gaussian splatting framework.

Brand-new JAX/XLA/Pallas implementation with the capabilities of the
reference PyTorch+CUDA framework (maxgillett/tinysplat): differentiable
tile-based splat rasterization, adaptive densification, depth-guided and
SuGaR-style density regularization, COLMAP data loading with undistortion,
a live websocket viewer, and PLY/mesh export — designed TPU-first (Pallas
kernels, static shapes, mesh sharding) rather than ported.

Facade mirrors /root/reference/tinysplat/__init__.py:1-5.
"""

import jax as _jax

# Geometry transforms and compositing matmuls are tiny-K contractions where
# bf16 MXU passes cost real accuracy (camera-space positions, conics). Default
# to full f32; hot kernels opt into lower precision explicitly where safe.
_jax.config.update("jax_default_matmul_precision", "highest")

from .cameras import Camera, CameraParams
from .scene import Scene, PointCloud
from .render import render
from .config import Config
from .models.gaussians import (
    GaussianParams,
    GaussianState,
    init_from_pcd,
    state_dict,
    from_state_dict,
)
from .train_loop import Trainer

__version__ = "0.1.0"

__all__ = [
    "Camera",
    "CameraParams",
    "Scene",
    "PointCloud",
    "render",
    "Config",
    "Trainer",
    "GaussianParams",
    "GaussianState",
    "init_from_pcd",
    "state_dict",
    "from_state_dict",
]
