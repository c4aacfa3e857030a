from .quaternions import (
    normalize_quat,
    quat_to_rotmat,
    quat_to_rotmat_np,
    random_quats,
)
from .color import RGB2SH, SH2RGB
from .cache import enable_compile_cache

__all__ = [
    "enable_compile_cache",
    "normalize_quat",
    "quat_to_rotmat",
    "quat_to_rotmat_np",
    "random_quats",
    "RGB2SH",
    "SH2RGB",
]
